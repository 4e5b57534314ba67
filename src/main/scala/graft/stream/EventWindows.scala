package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time window aggregations (SURVEY §2.8; the reference declares
  * the streaming branch in README.md:11,56 and
  * workflow_definition.json:77-81 but ships no code — semantics here are
  * stock Structured Streaming).
  *
  * Every function takes a plain DataFrame and is shared VERBATIM between
  * batch and streaming: a batch caller passes a static events frame, a
  * streaming caller passes `withWatermark`-tagged stream. Catalyst plans
  * the identical aggregation either way — this is the batch-parity
  * guarantee the `event_window` oracle query relies on (it routes
  * through `tumblingByType`, and `StreamSpec` proves a MemoryStream run
  * of the same function yields the same rows).
  *
  * Scale: windowed aggregation shuffles once on (window, key); state per
  * group is O(1) (count + sum), so executor state size is bounded by
  * live-window × key cardinality, and the watermark bounds live windows.
  */
object EventWindows {

  /** Tumbling event-time window × event_type: count + value sum.
    * `window(ts, d).start` equals `date_trunc` for aligned durations,
    * keeping the batch oracle SQL expressible in plain ANSI.
    */
  def tumblingByType(events: DataFrame, duration: String): DataFrame =
    events
      .groupBy(window(col("ts"), duration), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Sliding window × event_type (duration, slide). */
  def slidingByType(events: DataFrame, duration: String, slide: String): DataFrame =
    events
      .groupBy(window(col("ts"), duration, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Session windows per user with a gap timeout. */
  def sessionByUser(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("total_value"))
}
