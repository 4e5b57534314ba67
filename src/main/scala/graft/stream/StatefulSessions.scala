package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state sessionization via `flatMapGroupsWithState` (SURVEY
  * §2.8 — the "custom state" row the reference's declared stream branch
  * implies; `workflow_definition.json:77-81` processes events "when data
  * arrives" but ships no state code, so semantics are ours to define and
  * are pinned to [[EventWindows.sessionByUser]] / the `event_sessions`
  * oracle: sessions break when the gap between consecutive events is
  * ≥ the timeout, and a session ends at last-event + gap).
  *
  * Both paths fold *session aggregates* — (start, last, count, sum) —
  * never raw events. The streaming path keeps open sessions in
  * [[GroupState]] (state = O(open sessions)) and flushes them through
  * [[merge]]/[[advance]] on event-time timeout; the batch path
  * secondary-sorts by (user_id, ts) and streams a single open aggregate
  * per key through the partition iterator (memory = O(1) even for a
  * hot key). Both implement the same exact-gap boundary contract as
  * [[merge]], which is the batch-parity guarantee
  * `StatefulSessionsSpec` asserts (and the `event_sessions_state`
  * oracle checks against the same gaps-and-islands SQL as
  * `event_sessions`).
  *
  * Scale: one shuffle on user_id; state per key is a handful of longs
  * per *open* session and the event-time timeout bounds how long a
  * session can stay open, so total state is O(active users), the same
  * bound Spark's own `session_window` state store carries.
  */
object StatefulSessions {

  /** One (possibly partial) session: aggregates only. Micros epoch. */
  case class SessAgg(startUs: Long, lastUs: Long, n: Long, sum: Double)

  /** Per-key state: open sessions, kept merged and sorted. */
  case class OpenSessions(sessions: List[SessAgg])

  /** Internal row shape (public: encoder codegen must instantiate it).
    * Carries the raw timestamp column — NOT pre-converted micros —
    * because the event-time watermark tag lives in the column metadata
    * and EventTimeTimeout requires that column to survive into the
    * state operator's child output. */
  case class SEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)

  /** Timestamp → micros since epoch (micros precision preserved). */
  def usOf(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Interval-union fold: sort by start, collapse neighbors whose gap
    * is <= gapUs — INCLUSIVE at the boundary, matching Spark's
    * `session_window`, which merges touching windows (verified
    * empirically, pinned by `SessionBoundarySpec`): an event exactly
    * `gap` after the previous one extends the session. The
    * gaps-and-islands oracle uses the matching strict-`>` break rule,
    * so all three encodings agree on EVERY input, not just jittered
    * fixtures. Deterministic regardless of arrival order, which is
    * what lets a late-but-in-watermark event bridge two open sessions.
    */
  def merge(sessions: Seq[SessAgg], gapUs: Long): List[SessAgg] =
    sessions.sortBy(s => (s.startUs, s.lastUs))
      .foldLeft(List.empty[SessAgg]) { (acc, s) =>
        acc match {
          case head :: tail if s.startUs - head.lastUs <= gapUs =>
            SessAgg(head.startUs, math.max(head.lastUs, s.lastUs),
              head.n + s.n, head.sum + s.sum) :: tail
          case _ => s :: acc
        }
      }.reverse

  /** Merge, then split at the watermark: a session is closed once the
    * watermark is strictly past its quiet period (last + gap) — strict,
    * because an event AT last+gap still merges under the inclusive
    * boundary and events at the watermark are not late. */
  def advance(sessions: Seq[SessAgg], gapUs: Long, watermarkUs: Long)
      : (List[SessAgg], List[SessAgg]) =
    merge(sessions, gapUs).partition(s => s.lastUs + gapUs < watermarkUs)

  /** "30 minutes" / "1 hour" → micros (same strings the window
    * functions take; sub-day units only, so no calendar ambiguity). */
  private def gapUsOf(gap: String): Long = {
    val parts = gap.trim.toLowerCase.split("\\s+")
    require(parts.length == 2, s"gap must be '<n> <unit>', got '$gap'")
    val unitUs = parts(1).stripSuffix("s") match {
      case "second" => 1000000L
      case "minute" => 60000000L
      case "hour"   => 3600000000L
      case "day"    => 86400000000L
      case u => throw new IllegalArgumentException(s"unsupported gap unit '$u'")
    }
    parts(0).toLong * unitUs
  }

  private def toEvents(events: DataFrame): Dataset[SEvent] = {
    val s = events.sparkSession
    import s.implicits._
    events.select(
      col("user_id").cast("long").as("user_id"),
      col("ts"),
      col("value").cast("double").as("value")).as[SEvent]
  }

  private def shape(ds: Dataset[(Long, Long, Long, Long, Double)]): DataFrame =
    ds.toDF("start_us", "end_us", "user_id", "n_events", "sum_value")
      .select(
        timestamp_micros(col("start_us")).as("session_start"),
        timestamp_micros(col("end_us")).as("session_end"),
        col("user_id"), col("n_events").as("n_events"),
        round(col("sum_value"), 2).as("total_value"))

  /** Batch sessionization: end of input closes every session. Output
    * schema matches [[EventWindows.sessionByUser]] exactly, and the
    * exact-gap boundary matches [[merge]] and `session_window` (a gap
    * of exactly the timeout MERGES; the oracle breaks strictly past
    * the gap).
    *
    * Scale: a hash repartition on user_id plus a secondary sort on
    * (user_id, ts) — Spark's external sort spills, so a partition never
    * has to fit in memory — then a single-pass streaming fold that holds
    * exactly ONE open-session aggregate at a time. Per-key (and
    * per-partition) memory is O(1): a hot key with 10⁸ events costs no
    * more heap than one with 3. (The previous shape, `flatMapGroups`
    * with a per-key `toSeq`, materialized every event of a key.)
    */
  def sessionsBatch(events: DataFrame, gap: String): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val gapUs = gapUsOf(gap)
    val sorted = toEvents(events)
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts"))
    shape(sorted.mapPartitions { it =>
      new Iterator[(Long, Long, Long, Long, Double)] {
        private var pending: (Long, Long, Long, Long, Double) = _
        private var ready = false
        private var uid = 0L
        private var open: SessAgg = null
        private def close(): Unit = {
          pending = (open.startUs, open.lastUs + gapUs, uid, open.n, open.sum)
          ready = true
        }
        private def pull(): Unit = {
          while (!ready && it.hasNext) {
            val e = it.next(); val t = usOf(e.ts)
            if (open == null) {
              uid = e.user_id; open = SessAgg(t, t, 1L, e.value)
            } else if (e.user_id != uid) {
              close(); uid = e.user_id; open = SessAgg(t, t, 1L, e.value)
            } else if (t - open.lastUs > gapUs) {
              close(); open = SessAgg(t, t, 1L, e.value)
            } else {
              open = SessAgg(open.startUs, t, open.n + 1L, open.sum + e.value)
            }
          }
          if (!ready && open != null) { close(); open = null }
        }
        def hasNext: Boolean = { if (!ready) pull(); ready }
        def next(): (Long, Long, Long, Long, Double) = {
          if (!hasNext) throw new NoSuchElementException
          ready = false; pending
        }
      }
    })
  }

  /** Streaming sessionization with explicit custom state. Append-mode:
    * each session is emitted exactly once, when the event-time watermark
    * passes its quiet period — either on the microbatch that advanced
    * the watermark (new data for the key) or on the key's event-time
    * timeout (no new data). Late-event policy matches the windowed
    * aggregations: rows behind the watermark are dropped — explicitly,
    * inside the state function, because arbitrary-stateful operators do
    * not inherit the aggregation path's automatic late-row filter once
    * the event-time column has been projected away.
    */
  def sessionsStream(events: DataFrame, gap: String, delay: String): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val gapUs = gapUsOf(gap)
    val keyed = toEvents(events.withWatermark("ts", delay)).groupByKey(_.user_id)
    shape(keyed.flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (uid: Long, it: Iterator[SEvent], state: GroupState[OpenSessions]) =>
        val existing = if (state.exists) state.get.sessions else Nil
        val wmUs = state.getCurrentWatermarkMs() * 1000L
        val incoming = it.map(e => SessAgg(usOf(e.ts), usOf(e.ts), 1L, e.value))
          .filter(_.startUs >= wmUs).toList // drop late events
        val (closed, open) = advance(existing ++ incoming, gapUs, wmUs)
        if (open.isEmpty) {
          if (state.exists) state.remove()
        } else {
          state.update(OpenSessions(open))
          // Fire strictly after the EARLIEST quiet period ends (ms,
          // ceil): the oldest open session flushes as soon as the
          // watermark passes it, rather than waiting on the newest —
          // the timeout invocation re-advances and re-arms for the next.
          val quietEndMs = open.map(s => s.lastUs + gapUs).min / 1000L + 1L
          state.setTimeoutTimestamp(quietEndMs)
        }
        closed.iterator.map(c => (c.startUs, c.lastUs + gapUs, uid, c.n, c.sum))
    })
  }
}
