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
      bucketWidth: Double,
      maxBucketsPerRange: Long = 10000L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxBucketsPerRange > 0, "maxBucketsPerRange must be positive")
    // The range's bucket span is inclusive of floor(hi/w): when hi sits
    // exactly on a bucket edge this emits one bucket no point of the
    // half-open range maps to — the exact verify drops it, and the cost
    // of the spare bucket row is far below a correctness-risky edge
    // case on float division.
    val loBucket = floor(col(loCol) / bucketWidth).cast("long")
    val hiBucket = floor(col(hiCol) / bucketWidth).cast("long")
    val pb = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    // Fail loudly when a range explodes past the budget — a bucketWidth
    // orders of magnitude under the range lengths would otherwise emit
    // millions of bucket rows PER RANGE and look like a hung shuffle,
    // not a config error. (Also swallows inverted lo > hi ranges, which
    // can never match the half-open predicate.)
    // assert_true rides a filter (a dropped column would be pruned away
    // with the assertion in it); it returns null when the predicate
    // holds, so `.isNull` keeps every surviving row.
    val guarded = ranges
      .filter(assert_true(
        hiBucket - loBucket < lit(maxBucketsPerRange),
        concat(lit(s"range spans too many buckets (> $maxBucketsPerRange) at width "),
          lit(bucketWidth), lit(": ["), col(loCol), lit(", "), col(hiCol),
          lit(") — raise bucketWidth toward the median range length"))).isNull)
      .filter(loBucket <= hiBucket)
    val rb = guarded.withColumn("__bucket", explode(sequence(loBucket, hiBucket)))
    pb.join(rb, "__bucket")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
