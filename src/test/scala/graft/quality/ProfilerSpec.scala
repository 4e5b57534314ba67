package graft.quality

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Column profiler + referential check: exact metrics including null
  * counting, one-job plan shape, and orphan detection semantics
  * (NULL FKs are not orphans).
  */
class ProfilerSpec extends SparkTestBase {

  test("profile reports exact nulls/distinct/min/max per column") {
    val s = spark; import s.implicits._
    val df = Seq(
      (Some(1L), Some("b")), (Some(2L), None), (None, Some("a")),
      (Some(2L), Some("c"))).toDF("k", "v").repartition(3)
    val rows = Profiler.profile(df, Seq("k", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(rows("k") == ((4L, 1L, 2L, "1", "2")))
    assert(rows("v") == ((4L, 1L, 3L, "a", "c")))
  }

  test("profile plans one value-grouped aggregate per column, no Expand") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val plan = Profiler.profile(df, Seq("k", "v"))
      .queryExecution.optimizedPlan.toString
    // One pruned scan PER COLUMN under a union (independent stages —
    // the r10 shape), and never the Expand ×(cols+1) multi-distinct
    // plan that multi-copies the corpus through one exchange.
    assert("LocalRelation".r.findAllIn(plan).size == 2, plan)
    assert(!plan.contains("Expand"), plan)
  }

  test("profileApprox matches the exact profile except HLL cardinality") {
    val s = spark; import s.implicits._
    val df = (1 to 2000).map(i => (i.toLong, s"cat_${i % 7}")).toDF("k", "v")
    val exact = Profiler.profile(df, Seq("k", "v")).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = Profiler.profileApprox(df, Seq("k", "v")).collect()
      .map(r => r.getString(0) -> r).toMap
    for (c <- Seq("k", "v")) {
      // n_rows / n_nulls / min / max are exact in both variants.
      assert(approx(c).getLong(1) == exact(c).getLong(1), s"$c n_rows")
      assert(approx(c).getLong(2) == exact(c).getLong(2), s"$c n_nulls")
      assert(approx(c).getString(4) == exact(c).getString(4), s"$c min")
      assert(approx(c).getString(5) == exact(c).getString(5), s"$c max")
      // Cardinality within HLL's documented rsd (5% default; allow 3σ).
      val (est, truth) = (approx(c).getLong(3).toDouble, exact(c).getLong(3).toDouble)
      assert(math.abs(est - truth) / truth <= 0.15, s"$c distinct: est=$est truth=$truth")
    }
  }

  test("profileApprox plan has no Expand and scans once for all columns") {
    val s = spark; import s.implicits._
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val approxPlan = Profiler.profileApprox(df, Seq("k", "v"))
      .queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"), approxPlan)
    // The approx variant's contrast with exact since r10: ONE scan for
    // all columns (sketches ride a single aggregate) vs one
    // value-grouped aggregate per column.
    assert(!approxPlan.contains("Union"), approxPlan)
  }

  test("referential check counts orphans; NULL FKs are not orphans") {
    val s = spark; import s.implicits._
    val child = Seq(Some(1L), Some(1L), Some(5L), None).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val r = QualityChecks.referentialViolations(child, "fk", parent, "pk").head()
    assert(r.getLong(0) == 1L) // only fk=5 is an orphan
    assert(r.getLong(1) == 4L) // all child rows counted
  }

  test("histogram: sparse fixed-width bins, boundary values, nulls excluded") {
    val s = spark; import s.implicits._
    val df = Seq(Some(0.0), Some(4999.99), Some(5000.0), Some(12000.0), None)
      .toDF("v")
    val bins = Profiler.histogram(df, "v", 5000.0).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toMap
    // 5000.0 lands in bin 1 (floor of an exact boundary), null drops,
    // and the empty bin between 1 and 2 is absent (sparse).
    assert(bins == Map(
      0L -> (0.0, 5000.0, 2L),
      1L -> (5000.0, 10000.0, 1L),
      2L -> (10000.0, 15000.0, 1L)))
  }
}
