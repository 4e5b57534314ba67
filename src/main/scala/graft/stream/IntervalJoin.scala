package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time interval (stream-stream) join: attribute each left event
  * to the right-side events of the same key that occur within
  * `[left.ts, left.ts + horizon)` — the click/view → purchase
  * attribution shape. The reference declares its streaming branch but
  * ships no code (`/root/reference/README.md:11,55-56`,
  * `workflow_definition.json:77-81`); semantics here are stock
  * Structured Streaming stream-stream inner join.
  *
  * Shared VERBATIM between batch and streaming (the EventWindows
  * pattern): a batch caller passes static frames; a streaming caller
  * passes `withWatermark`-tagged streams and gets an append-mode
  * stream-stream join. The rename projections preserve the watermark
  * tag (Alias copies attribute metadata), and the join carries both
  * requirements Spark imposes on streaming joins: an equality key
  * (user_id — this is also the state-store partitioning key) and a
  * time-range predicate on both event-time columns, which is what lets
  * the engine evict state.
  *
  * Scale: both sides shuffle once on user_id; per-key state is bounded
  * by (watermark delay + horizon) worth of events, NOT the full
  * history — eviction follows from the range predicate. In batch,
  * Catalyst plans the same equality key as a hash join (broadcast if a
  * side is small) with the range as a post-filter, so the cost is one
  * keyed shuffle of each side regardless of match density; no
  * cross-product ever forms.
  */
object IntervalJoin {

  /** Pairs (view, purchase) per user with `purchase_ts` in
    * `[view_ts, view_ts + horizon)`. Inputs are event-shaped frames
    * (`user_id, event_id, ts, value`); both may be filtered views of
    * the same source (self-join is fine, batch or stream).
    */
  def attribution(views: DataFrame, purchases: DataFrame, horizon: String): DataFrame =
    joined(views, purchases, horizon, "inner")

  /** LEFT OUTER attribution: every view appears exactly once per
    * matching purchase, or once with NULL purchase columns if nothing
    * converts inside the horizon — the "which views did NOT convert"
    * query, which an inner join structurally cannot answer.
    *
    * In streaming this is Spark's left-outer stream-stream join: the
    * null-extended row for an unmatched view is emitted only once the
    * WATERMARK has passed `view_ts + horizon` (before that, a matching
    * purchase could still arrive), so unmatched results trail the
    * stream by delay + horizon — the price of a correct negative. Same
    * state bound as the inner join; eviction still follows from the
    * range predicate. In batch, end-of-input closes the question and
    * Catalyst plans a plain left outer hash join.
    */
  def attributionLeft(views: DataFrame, purchases: DataFrame, horizon: String): DataFrame =
    joined(views, purchases, horizon, "left_outer")

  private def joined(views: DataFrame, purchases: DataFrame, horizon: String,
      how: String): DataFrame = {
    val v = views.select(
      col("user_id"),
      col("event_id").as("view_id"),
      col("ts").as("view_ts"))
    val p = purchases.select(
      col("user_id").as("p_user_id"),
      col("event_id").as("purchase_id"),
      col("ts").as("purchase_ts"),
      col("value").as("purchase_value"))
    v.join(p,
        col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") < col("view_ts") + expr(s"INTERVAL $horizon"),
        how)
      .select(
        col("user_id"), col("view_id"), col("purchase_id"),
        col("view_ts"), col("purchase_ts"), col("purchase_value"))
  }
}
