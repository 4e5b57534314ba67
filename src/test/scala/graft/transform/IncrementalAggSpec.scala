package graft.transform

import graft.SparkTestBase

class IncrementalAggSpec extends SparkTestBase {

  test("merge: both-sides sum, current-only and delta-only keys survive") {
    val s = spark; import s.implicits._
    val cur = Seq((1L, 10L, 100L), (2L, 5L, 50L)).toDF("k", "n", "v")
    val delta = Seq((2L, 1L, 7L), (3L, 2L, 20L)).toDF("k", "n", "v")
    val out = IncrementalAgg.merge(cur, delta, Seq("k"), Seq("n", "v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 10L, 100L), (2L, 6L, 57L), (3L, 2L, 20L)))
  }

  test("merge is idempotent-composable: folding two deltas equals one") {
    val s = spark; import s.implicits._
    val cur = Seq((1L, 1L)).toDF("k", "n")
    val d1 = Seq((1L, 2L)).toDF("k", "n")
    val d2 = Seq((1L, 4L), (9L, 1L)).toDF("k", "n")
    val both = IncrementalAgg.merge(
      IncrementalAgg.merge(cur, d1, Seq("k"), Seq("n")), d2, Seq("k"), Seq("n"))
    val once = IncrementalAgg.merge(cur,
      IncrementalAgg.merge(d1, d2, Seq("k"), Seq("n")), Seq("k"), Seq("n"))
    assert(both.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      once.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }
}
