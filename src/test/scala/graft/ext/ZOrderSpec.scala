package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Z-order layout: per-file bounding boxes must be tight on BOTH
  * dimensions, so a selective predicate on EITHER column intersects
  * only a fraction of files — the property min/max footer pruning
  * exploits. A linear (x-sorted) layout of the same data prunes on x
  * only: every file spans the full y range.
  */
class ZOrderSpec extends SparkTestBase {

  private val N = 1 << 14 // 16k points over a 1024x1024 grid
  private val Files16 = 16

  /** Deterministic pseudo-uniform grid points (splitmix-style mix). */
  private def points: DataFrame = {
    val s = spark; import s.implicits._
    (0 until N).map { i =>
      val h = (i * 0x9E3779B97F4A7C15L) ^ (i << 7)
      (math.floorMod(h, 1024L), math.floorMod(h >> 17, 1024L))
    }.toDF("x", "y")
  }

  /** Per-file [min,max] of a column after reading a layout back. */
  private def fileBounds(path: String, c: String): Array[(Long, Long)] =
    spark.read.parquet(path)
      .groupBy(input_file_name()).agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))

  private def hits(bounds: Array[(Long, Long)], lo: Long, hi: Long): Int =
    bounds.count { case (l, h) => h >= lo && l <= hi }

  test("morton interleave is a bijection on the grid") {
    val s = spark; import s.implicits._
    val n = points.select(ZOrder.zValue($"x", $"y", 10).as("z"))
      .agg(countDistinct($"z")).head().getLong(0)
    assert(n == points.distinct().count())
  }

  test("z-order files prune on BOTH dimensions; linear sort on one") {
    val zDir = Files.createTempDirectory("graft-z").toString + "/z"
    val linDir = Files.createTempDirectory("graft-z").toString + "/lin"
    ZOrder.writeZOrdered(points, zDir, "x", "y", 10, Files16)
    points.repartitionByRange(Files16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linDir)

    // A narrow y-slab (width 64, inside one 256-wide z-block — the
    // 16-file z-curve tiles the grid 4×4, so unaligned slabs straddle
    // two block rows): the x-sorted layout cannot prune it — every
    // file spans ~the full y range — while z-ordered files carry tight
    // y bounds and most skip.
    val ySlabZ = hits(fileBounds(zDir, "y"), 512, 575)
    val ySlabLin = hits(fileBounds(linDir, "y"), 512, 575)
    assert(ySlabLin >= Files16 - 1, s"x-sorted layout unexpectedly pruned y: $ySlabLin")
    assert(ySlabZ <= Files16 / 2, s"z-order should skip most files for a y-slab, hit $ySlabZ")

    // And x-predicates still prune on the z layout (worse than the
    // x-sorted ideal, but bounded — that's the trade). The bound has a
    // +2 allowance over the geometric ~Files16/2: repartitionByRange
    // draws its split points from a sampled sketch whose seed varies
    // with session RDD ids, so a split can land a file boundary inside
    // the slab's z-range and add a straddling file or two.
    val xSlabZ = hits(fileBounds(zDir, "x"), 256, 319)
    assert(xSlabZ <= Files16 / 2 + 2, s"z-order should also prune x-slabs, hit $xSlabZ")
  }
}
