package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static enrichment (SURVEY §2.8): a fact stream joined to a
  * slowly-changing dimension — the lookup every event pipeline runs
  * (user → segment, product → category) before aggregating.
  *
  * Shared VERBATIM between batch and streaming like [[EventWindows]]:
  * the static side carries a broadcast hint, so the streaming plan is
  * a stateless per-micro-batch broadcast hash join (no streaming
  * state, no watermark requirement — only stream-STREAM joins need
  * one), and the batch twin plans the identical join. At cluster
  * scale the dimension is the small side by construction; a dimension
  * too big to broadcast belongs in the stream-stream interval join or
  * a pre-bucketed layout instead.
  */
object StreamEnrich {

  /** Left-join `events` to dimension rows on `eventKey` = `dimKey`,
    * keeping `dimCols`. Left outer: an event without a dimension row
    * survives with nulls — enrichment must never drop facts.
    */
  def enriched(events: DataFrame, dim: DataFrame, eventKey: String,
      dimKey: String, dimCols: Seq[String]): DataFrame =
    events.join(
      broadcast(dim.select((dimKey +: dimCols).map(col): _*)),
      col(eventKey) === col(dimKey), "left")
      .drop(dimKey)

  /** Enriched rollup: event counts and exact-decimal value sums per
    * (dimension attribute, event type) — the segment-level revenue
    * view of the event stream.
    */
  def segmentRollup(events: DataFrame, dim: DataFrame, eventKey: String,
      dimKey: String, segCol: String): DataFrame =
    enriched(events, dim, eventKey, dimKey, Seq(segCol))
      .groupBy(col(segCol), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("total_value"))
}
