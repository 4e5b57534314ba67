package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming rolling anomaly gate: the online twin of the batch
  * `ts_anomaly` query — every event judged against its key's
  * strictly-prior 24h history with the SAME pure-BIGINT z² predicate
  * ((v·n − s1)² > 9·(n·s2 − s1²) over integer cents), so the two
  * paths agree row-for-row on ordered replay (`StreamAnomalySpec`).
  *
  * State shape: a bounded sliding DEQUE of (micros, cents) per key —
  * the fourth state taxonomy entry after the sessionizer's aggregates,
  * the funnel's stage cursors, and the LOCF carry's register. Size is
  * bounded by the key's own 24h event rate; eviction rides the next
  * event (drop-from-front before judging), so a quiet key parks a
  * window's worth of state — bound it operationally with a state-TTL
  * config if keys churn, the same knob Spark's own dedup state needs.
  *
  * Ordering contract (as StreamLocf): intra-batch disorder is folded
  * in (ts, event_id) order; cross-batch stragglers are judged against
  * whatever history the deque then holds — the online answer cannot
  * retro-judge, which is exactly how a production monitor behaves.
  */
object StreamAnomaly {

  val WindowMicros: Long = 24L * 3600 * 1000000
  val MinPrior = 5

  /** Per-key sliding history, oldest first. */
  case class Hist(events: List[(Long, Long)])

  /** The batch twin's exact predicate over the prior window. */
  private[stream] def judge(prior: Seq[Long], v: Long): Option[(Long, Long, Long)] = {
    val n = prior.length.toLong
    if (n < MinPrior) return None
    val s1 = prior.sum
    val s2 = prior.map(c => c * c).sum
    val den = n * s2 - s1 * s1
    val d = v * n - s1
    val num = d * d
    if (den > 0 && num > 9L * den) Some((n, num, den)) else None
  }

  /** Streaming path: emits (event_id, user_id, cents, n_prior,
    * zsq_num, zsq_den) for anomalous events only — the batch
    * `ts_anomaly` columns.
    */
  def anomalyStream(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val keyed = events
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("value"))
      .as[StreamLocf.CEvent]
      .groupByKey(_.user_id)
    keyed.flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (uid: Long, it: Iterator[StreamLocf.CEvent], state: GroupState[Hist]) =>
        var hist = if (state.exists) state.get.events else Nil
        val out = it.toSeq
          .sortBy(e => (StatefulSessions.usOf(e.ts), e.event_id))
          .flatMap { e =>
            val us = StatefulSessions.usOf(e.ts)
            val cents = BigDecimal(e.value * 100)
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
            // Evict, judge against the strictly-prior window, admit.
            hist = hist.dropWhile { case (t, _) => t < us - WindowMicros }
            val prior = hist.collect { case (t, c) if t < us => c }
            val verdict = judge(prior, cents)
              .map { case (n, num, den) => (e.event_id, uid, cents, n, num, den) }
            hist = hist :+ (us -> cents)
            verdict
          }
        state.update(Hist(hist))
        out.iterator
    }.toDF("event_id", "user_id", "cents", "n_prior", "zsq_num", "zsq_den")
  }
}
