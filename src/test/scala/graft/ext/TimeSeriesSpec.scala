package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.SparkTestBase

class TimeSeriesSpec extends SparkTestBase {

  // Buckets of 10 seconds keep the hand-arithmetic readable.
  private val Bucket = 10L * 1000000

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  private def run(rows: Seq[(Long, Long, Double, Long)]) = {
    val s = spark; import s.implicits._
    val df = rows.toDF("user_id", "sec", "value", "event_id")
      .select(col("user_id"), col("sec").cast("timestamp").as("ts"),
        col("value"), col("event_id"))
    TimeSeries.gapfill(df, "user_id", "ts", "value", "event_id", Bucket)
      .orderBy("user_id", "bucket_ts").collect()
  }

  test("gap buckets are generated with zero counts and carried values") {
    // key 1: observations in buckets 0 and 3 (seconds 5 and 35) — gaps
    // at buckets 1 and 2 must appear with n_events=0, v_cents=0.
    val out = run(Seq((1L, 5L, 1.00, 10L), (1L, 35L, 4.00, 11L)))
    assert(out.length == 4)
    assert(out.map(_.getAs[Timestamp]("bucket_ts")) ===
      Seq(ts(0), ts(10), ts(20), ts(30)))
    assert(out.map(_.getAs[Long]("n_events")).toSeq == Seq(1L, 0L, 0L, 1L))
    assert(out.map(_.getAs[Long]("v_cents")).toSeq == Seq(100L, 0L, 0L, 400L))
    // LOCF: 100 carried across the gap until the 400 observation.
    assert(out.map(_.getAs[Long]("locf_cents")).toSeq ==
      Seq(100L, 100L, 100L, 400L))
    // Linear interpolation 1.00 → 4.00 over 3 bucket steps.
    assert(out.map(_.getAs[Double]("v_interp")).toSeq ==
      Seq(1.0, 2.0, 3.0, 4.0))
  }

  test("bucket observation is the latest event's value; sums are exact cents") {
    // Two events in bucket 0: the higher event_id (arrival order) wins
    // the observation; the sum covers both.
    val out = run(Seq((7L, 1L, 1.10, 1L), (7L, 9L, 2.20, 2L)))
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_events") == 2L)
    assert(out.head.getAs[Long]("v_cents") == 330L)
    assert(out.head.getAs[Long]("obs_cents") == 220L)
    assert(out.head.getAs[Double]("v_interp") == 2.2)
  }

  test("series are per-key: no spine bleeds across keys") {
    val out = run(Seq(
      (1L, 5L, 1.00, 1L), (1L, 25L, 3.00, 2L), // key 1: buckets 0..2
      (2L, 45L, 9.00, 3L)))                    // key 2: single bucket 4
    assert(out.count(_.getAs[Long]("user_id") == 1L) == 3)
    val k2 = out.filter(_.getAs[Long]("user_id") == 2L)
    assert(k2.length == 1 && k2.head.getAs[Timestamp]("bucket_ts") == ts(40))
    assert(k2.head.getAs[Double]("v_interp") == 9.0)
  }

  test("pre-epoch timestamps bucket by FLOOR, not truncate-toward-zero") {
    // -5s sits in bucket [-10s, 0s): floor(-5e6/1e7) = -1. Truncating
    // division would put it in bucket 0 and disagree with the oracle's
    // floor `//`.
    val out = run(Seq((1L, -5L, 1.00, 1L)))
    assert(out.length == 1)
    assert(out.head.getAs[Timestamp]("bucket_ts") == ts(-10))
  }

  test("single pass: one scan, one window, generated gaps (no spine join)") {
    val df = graft.Tables.t(spark, sf0001, "events")
    val plan = TimeSeries.gapfill(df, "user_id", "ts", "value", "event_id", Bucket)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"gapfill must not join a spine:\n$plan")
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      s"gapfill must scan its input once:\n$plan")
    assert("Window".r.findAllIn(plan).size == 1,
      s"gapfill needs exactly one window pass:\n$plan")
  }
}
