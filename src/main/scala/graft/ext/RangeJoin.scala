package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-range join — match each point to every range [lo, hi) that
  * contains it (price bands, IP blocks, time buckets, histogram
  * binning at corpus scale).
  *
  * Spark plans a bare `p >= lo AND p < hi` join as
  * BroadcastNestedLoopJoin — O(|points|·|ranges|) and a driver OOM the
  * moment the ranges side outgrows the broadcast threshold. The scale
  * shape is bucketization: pick a bucket width, map each point to ONE
  * bucket, explode each range across the buckets it overlaps, equi-join
  * on the bucket id (hash shuffle, AQE-skew-splittable), and verify the
  * exact containment predicate after the join. Cost is
  * O(|points| + |ranges|·spread + |matches|) where spread ≈
  * rangeLength/bucketWidth + 1 — pick `bucketWidth` near the median
  * range length so the explosion factor stays ~2.
  */
object RangeJoin {

  def pointInRange(
      points: DataFrame, pointCol: String,
      ranges: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // The range's bucket span is inclusive of floor(hi/w): when hi sits
    // exactly on a bucket edge this emits one bucket no point of the
    // half-open range maps to — the exact verify drops it, and the cost
    // of the spare bucket row is far below a correctness-risky edge
    // case on float division.
    val pb = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val rb = ranges.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    pb.join(rb, "__bucket")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
