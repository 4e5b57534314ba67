package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Bucketized point-in-range join: equivalence with the naive
  * theta-join on a fixture small enough to afford it, across bucket
  * widths that do and don't divide the range bounds.
  */
class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val points = Seq(
    (1L, 0.0), (2L, 4.999), (3L, 5.0), (4L, 7.5), (5L, 12.0),
    (6L, 15.0), (7L, 22.5), (8L, -3.0), (9L, 100.0))
    .toDF("pid", "p")

  // Overlapping, touching, and bucket-edge-aligned ranges.
  private val ranges = Seq(
    (100L, 0.0, 10.0),   // hi on a bucket edge for width 5
    (101L, 5.0, 15.0),   // overlaps 100; hi on edge
    (102L, 7.5, 22.5),   // unaligned bounds
    (103L, -5.0, 0.0),   // negative lo, hi exclusive at 0
    (104L, 30.0, 40.0))  // matches nothing
    .toDF("rid", "lo", "hi")

  private def naive = points.crossJoin(ranges)
    .filter($"p" >= $"lo" && $"p" < $"hi")
    .select($"pid", $"rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("matches the naive theta-join for widths aligned and unaligned with bounds") {
    for (w <- Seq(5.0, 4.0, 7.5, 100.0)) {
      val bucketed = RangeJoin.pointInRange(points, "p", ranges, "lo", "hi", w)
        .select($"pid", $"rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(bucketed == naive, s"width $w diverged from the exact join")
    }
    assert(naive.contains((1L, 100L)) && !naive.contains((1L, 103L)), "hi is exclusive")
    assert(naive.contains((4L, 100L)) && naive.contains((4L, 101L)) &&
      naive.contains((4L, 102L)), "overlapping ranges all match")
    assert(naive.contains((8L, 103L)), "negative points bucket correctly")
  }

  test("a range spanning more buckets than the budget fails loudly") {
    val wide = Seq((1L, 0.0, 1000000.0)).toDF("rid", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.pointInRange(points, "p", wide, "lo", "hi",
        bucketWidth = 1.0, maxBucketsPerRange = 1000).count()
    }
    assert(e.getMessage.contains("too many buckets") ||
      Option(e.getCause).exists(_.getMessage.contains("too many buckets")))
    // and inverted ranges are dropped, not exploded descending
    val inverted = Seq((2L, 50.0, 10.0)).toDF("rid", "lo", "hi")
    assert(RangeJoin.pointInRange(points, "p", inverted, "lo", "hi", 5.0).count() == 0)
  }

  test("plan is an equi-join on the bucket id, not a nested-loop join") {
    val plan = RangeJoin.pointInRange(points, "p", ranges, "lo", "hi", 5.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$plan")
  }
}
