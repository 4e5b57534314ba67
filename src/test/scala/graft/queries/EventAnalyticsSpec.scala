package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.Tables.t

/** Event-analytics semantics (ordered funnel, weekly cohort retention)
  * on crafted fixtures where every stage decision is hand-checkable,
  * plus the single-shuffle plan contracts the implementations claim.
  */
class EventAnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  /** Run eventFunnel against an in-memory events table via a temp dir. */
  private def funnelOf(rows: Seq[(Long, String, Timestamp)]): Map[String, Long] = {
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    rows.toDF("user_id", "event_type", "ts")
      .withColumn("ts", col("ts").cast("long") * 1000000000L) // nanos-as-long layout
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Relational.eventFunnel(spark, dir)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
  }

  test("funnel orders stages by time with >= semantics") {
    val events = Seq(
      // user 1: clean full chain
      (1L, "signup", ts(0)), (1L, "view", ts(1)), (1L, "click", ts(2)),
      (1L, "purchase", ts(3)),
      // user 2: view BEFORE signup and never again → stalls at stage 1
      (2L, "view", ts(0)), (2L, "signup", ts(1)),
      // user 3: signup and view at the SAME timestamp → >= admits the view
      (3L, "signup", ts(5)), (3L, "view", ts(5)),
      // user 4: no signup at all → appears in no stage
      (4L, "view", ts(0)), (4L, "click", ts(1)), (4L, "purchase", ts(2)),
      // user 5: click fires before the qualifying view → stalls at stage 2
      (5L, "signup", ts(0)), (5L, "click", ts(1)), (5L, "view", ts(2)),
      (5L, "purchase", ts(1)))
    val f = funnelOf(events)
    assert(f == Map("signup" -> 4L, "view" -> 3L, "click" -> 1L, "purchase" -> 1L))
  }

  test("funnel counts are monotone and the plan shuffles events exactly once") {
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val df = Relational.eventFunnel(spark, sf0001)
      val counts = df.collect().sortBy(_.getInt(0)).map(_.getLong(2))
      assert(counts.length == 4)
      for (Array(hi, lo) <- counts.sliding(2))
        assert(hi >= lo, s"funnel must be monotone, got ${counts.toSeq}")
      // One exchange moves the events table (hash by user_id); the only
      // other exchange feeds the final 4-row rollup with one flag row
      // per user. Anything more means the window chain re-shuffled.
      val exchanges = df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.size == 2,
        s"expected events-shuffle + rollup only:\n${df.queryExecution.executedPlan}")
    }
  }

  test("cohort retention assigns Monday cohorts and integer week offsets") {
    val dir = java.nio.file.Files.createTempDirectory("cohort").toString
    def at(d: String): Timestamp = Timestamp.valueOf(s"$d 12:00:00")
    Seq(
      // users 1,2 cohort at week of Mon 2024-01-01 (1st is a Monday)
      (1L, at("2024-01-01")), (1L, at("2024-01-16")), // active weeks 0 and 2
      (2L, at("2024-01-03")),                         // week 0 only
      // user 3 cohorts the following week
      (3L, at("2024-01-10")), (3L, at("2024-01-15"))) // weeks 0 and 1
      .toDF("user_id", "ts")
      .withColumn("ts", col("ts").cast("long") * 1000000000L)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val cells = Relational.cohortRetention(spark, dir)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    assert(cells == Map(
      ("2024-01-01", 0L) -> 2L, ("2024-01-01", 2L) -> 1L,
      ("2024-01-08", 0L) -> 1L, ("2024-01-08", 1L) -> 1L))
  }

  test("cohort retention never joins events back to itself: one events shuffle") {
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val df = Relational.cohortRetention(spark, sf0001)
      val rows = df.collect()
      assert(rows.nonEmpty && rows.forall(_.getLong(1) >= 0L))
      // Window-min over the user partitioning replaces the classic
      // first-event self-join: events shuffle once, then only distinct
      // (cohort, offset, user) triples move (two partial-agg exchanges).
      val plans = df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(plans.size <= 3,
        s"cohort plan re-shuffles events:\n${df.queryExecution.executedPlan}")
    }
  }
}
