package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Zone-map skipping: index completeness, pruning actually reducing the
  * file set, and exactness of the pruned scan vs the plain filter.
  */
class ZoneMapSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val dataPath = {
    val p = Files.createTempDirectory("graft-zm").toString + "/data"
    ZoneMap.landClustered(
      (1L to 10000L).map(i => (i, i % 97)).toDF("v", "other"),
      p, "v", numFiles = 10)
    p
  }
  private lazy val index = ZoneMap.buildIndex(spark, dataPath, "v").cache()

  test("index covers every file and every row") {
    assert(index.count() == 10)
    assert(index.agg(sum($"n_rows")).head().getLong(0) == 10000L)
    // Range-clustered zones are disjoint: global min/max recoverable.
    assert(index.agg(min($"zmin"), max($"zmax")).head() match {
      case r => r.getLong(0) == 1L && r.getLong(1) == 10000L
    })
  }

  test("selective range opens a strict subset of files; result is exact") {
    val (scan, read, total) = ZoneMap.prunedRangeScan(
      spark, dataPath, index, "v", 2000L, 2999L)
    // repartitionByRange samples its boundaries, so a 10 % window can
    // straddle a few files — but never most of them.
    assert(total == 10 && read <= 4, s"expected <=4 of 10 files, read $read")
    val expect = spark.read.parquet(dataPath).filter($"v".between(2000L, 2999L))
    assert(scan.exceptAll(expect).isEmpty && expect.exceptAll(scan).isEmpty)
    assert(scan.count() == 1000)
  }

  test("disjoint range reads zero files and returns empty") {
    val (scan, read, _) = ZoneMap.prunedRangeScan(
      spark, dataPath, index, "v", 50000L, 60000L)
    assert(read == 0)
    assert(scan.count() == 0)
  }
}
