package graft.stream

import org.apache.spark.sql.DataFrame

/** Stateful streaming dedup (SURVEY §2.8 St5).
  *
  * `dropDuplicatesWithinWatermark` keeps per-key state only until the
  * watermark passes the key's event time + delay, so state is bounded —
  * the streaming analog of the batch exact-dedup groupBy. Keys should be
  * the natural record identity (e.g. event_id), NOT the payload, for the
  * same fixed-width-shuffle-key reason as batch dedup.
  */
object StreamDedup {
  def withinWatermark(
      events: DataFrame,
      tsCol: String,
      delay: String,
      keys: Seq[String]): DataFrame =
    events.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keys)
}
