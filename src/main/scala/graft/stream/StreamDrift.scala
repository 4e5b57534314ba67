package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed category-drift gate: per event-time window, a chi-square
  * goodness-of-fit of the event-type mix against the uniform
  * expectation — the online "did this hour's traffic composition
  * move?" monitor, the categorical sibling of [[StreamAnomaly]]'s
  * numeric gate.
  *
  * Exactness: with K types and window total n, the statistic
  * χ² = Σ (cᵢ − n/K)² / (n/K) is cleared to integers as
  * num = Σ (K·cᵢ − n)², χ² = num / (K·n) — counts are exact longs,
  * num is a BIGINT, and the single division is rounded to 6, so the
  * batch query hash-matches its DuckDB oracle and the streaming twin
  * reproduces it row-for-row.
  *
  * Shape: ONE windowed aggregate — the K per-type counts are
  * conditional sums in the same groupBy(window), not a second
  * stateful stage, so the streaming plan is a single state store and
  * the batch plan one partial-aggregated exchange to the
  * windows-sized frame.
  */
object StreamDrift {

  /** The fixture's closed type vocabulary; a deployment would load
    * this from config the way [[graft.ext.TextAnalysis.LangProfiles]]
    * loads language profiles.
    */
  val Types: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** Shared batch/stream plan: works on a static frame or a stream
    * (the groupBy(window(...)) shape is identical; callers add the
    * watermark on the streaming side).
    */
  def driftByWindow(events: DataFrame, duration: String): DataFrame = {
    val k = Types.length
    val counts = Types.zipWithIndex.map { case (t, i) =>
      sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"__c_$i")
    }
    val n = Types.indices.map(i => col(s"__c_$i")).reduce(_ + _)
    val num = Types.indices
      .map(i => (lit(k.toLong) * col(s"__c_$i") - col("n")) *
        (lit(k.toLong) * col(s"__c_$i") - col("n")))
      .reduce(_ + _)
    events
      .groupBy(window(col("ts"), duration))
      .agg(counts.head, counts.tail: _*)
      .withColumn("n", n)
      .withColumn("chi2_num", num)
      .select(col("window.start").as("window_start"), col("n"),
        col("chi2_num"),
        round(col("chi2_num") / (lit(k.toLong) * col("n")), 6).as("chi2"))
  }
}
