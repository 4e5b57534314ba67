package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Temporal battery: time-series regularization (resample / gap-fill /
  * LOCF / interpolation) and event-time range-frame windows — the two
  * window shapes the rest of the suite doesn't cover (spine-joined
  * buckets and RANGE BETWEEN frames vs the ROWS frames of
  * `window_running`).
  */
object Temporal {

  /** 6-hour buckets: sparse enough on the fixture (~2 events/user/day)
    * that interior gaps actually occur, so LOCF and interpolation are
    * exercised on real holes, not degenerate dense series.
    */
  private val BucketMicros = 6L * 3600 * 1000000

  private val DayMicros = 24L * 3600 * 1000000

  def tsGapfill(s: SparkSession, dir: String): DataFrame =
    graft.ext.TimeSeries.gapfill(
      t(s, dir, "events"), "user_id", "ts", "value", "event_id", BucketMicros)

  /** Trailing 24h event-time window per user: RANGE frame over
    * event-time micros, so the frame is defined by TIME, not row
    * count — simultaneous events all enter together and quiet periods
    * shrink the frame. Sums are exact integer cents.
    *
    * Scale shape: one exchange on user_id; the range frame is a single
    * sort-based window pass (no self-join against a time predicate,
    * which is the naive O(n²) rewrite).
    */
  def tsRolling(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(ts)").as("tus"),
        expr("cast(round(value * 100, 0) as bigint)").as("cents"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"))
      .rangeBetween(-DayMicros, 0)
    e.select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_24h"),
        sum(col("cents")).over(w).as("cents_24h"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_gapfill" -> (tsGapfill _),
    "ts_rolling" -> (tsRolling _))

  val oracle: Map[String, String] = Map(
    "ts_gapfill" -> graft.ext.TimeSeries.gapfillOracleSql(BucketMicros),
    "ts_rolling" ->
      s"""SELECT event_id, user_id,
         |  count(*) OVER w AS n_24h,
         |  CAST(sum(cents) OVER w AS BIGINT) AS cents_24h
         |FROM (
         |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
         |    CAST(round(value * 100, 0) AS BIGINT) AS cents
         |  FROM events)
         |WINDOW w AS (PARTITION BY user_id ORDER BY tus
         |  RANGE BETWEEN $DayMicros PRECEDING AND CURRENT ROW)""".stripMargin)
}
