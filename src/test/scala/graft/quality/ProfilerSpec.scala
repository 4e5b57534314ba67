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

  test("profile is one aggregate job: a single scan in the plan") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val plan = Profiler.profile(df, Seq("k", "v"))
      .queryExecution.optimizedPlan.toString
    // One LocalRelation leaf — the profile never re-scans per column.
    assert("LocalRelation".r.findAllIn(plan).size == 1, plan)
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
