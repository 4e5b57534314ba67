package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming last-observation carry (LOCF enrichment): every event is
  * emitted tagged with its key's PREVIOUS observed value — the online
  * form of the carry in [[graft.ext.TimeSeries.gapfill]], and the
  * state shape the suite's other stateful operators don't cover: a
  * constant-size per-key register (two longs), not a growing
  * aggregate. Sessionization folds session aggregates and the funnel
  * folds stage cursors; the carry register is what online feature
  * stores and delta-encoders keep per key.
  *
  * Parity contract (`StreamLocfSpec`): over per-key event-time-ordered
  * arrival — the replayed-log shape — the stream emits exactly the
  * batch twin's rows, including across micro-batch boundaries (the
  * register survives in [[GroupState]]). Within a micro-batch the
  * group's rows are folded in (ts, event_id) order, so intra-batch
  * disorder is tolerated; an event older than the register (cross-
  * batch disorder) still emits, carrying the register as its
  * "previous" — the online answer can't rewind what it already
  * served.
  *
  * Scale: one shuffle on the key (the groupByKey exchange); state is
  * exactly 16 bytes per key ever seen, no timeout needed — the
  * register IS the value a new event wants, however old.
  */
object StreamLocf {

  /** Row shape through the state operator (public: encoder codegen). */
  case class CEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
      value: Double)

  /** The carry register: when and what the key last observed. */
  case class Carry(lastUs: Long, lastEid: Long, lastCents: Long)

  /** Same HALF_UP as the batch twin's round(value*100, 0) — math.round
    * (floor(x+0.5)) would disagree on negative halves.
    */
  private def centsOf(v: Double): Long =
    BigDecimal(v * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def toEvents(events: DataFrame) = {
    val s = events.sparkSession
    import s.implicits._
    events.select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[CEvent]
  }

  private def shape(ds: org.apache.spark.sql.Dataset[(Long, Long, Long, Option[Long])]): DataFrame =
    ds.toDF("event_id", "user_id", "cents", "prev_cents")

  /** Streaming path: fold each micro-batch group in (ts, event_id)
    * order against the carry register. Append-mode, no timeout — the
    * register never expires (a key's next event may come arbitrarily
    * late and still wants the carry).
    */
  def carryStream(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val keyed = toEvents(events).groupByKey(_.user_id)
    shape(keyed.flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (uid: Long, it: Iterator[CEvent], state: GroupState[Carry]) =>
        var carry = if (state.exists) Some(state.get) else None
        val out = it.toSeq
          .sortBy(e => (StatefulSessions.usOf(e.ts), e.event_id))
          .map { e =>
            val prev = carry.map(_.lastCents)
            val us = StatefulSessions.usOf(e.ts)
            // Advance only forward: a cross-batch straggler reads the
            // register but must not rewind it.
            if (carry.forall(c =>
                us > c.lastUs || (us == c.lastUs && e.event_id > c.lastEid))) {
              carry = Some(Carry(us, e.event_id, centsOf(e.value)))
            }
            (e.event_id, uid, centsOf(e.value), prev)
          }
        carry.foreach(state.update)
        out.iterator
    })
  }

  /** Batch twin: the same rows from a lag window over (ts, event_id)
    * — the parity target the spec holds the stream to.
    */
  def carryBatch(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    events.select(col("event_id"), col("user_id"),
      expr("cast(round(value * 100, 0) as bigint)").as("cents"),
      lag(expr("cast(round(value * 100, 0) as bigint)"), 1).over(w)
        .as("prev_cents"))
  }
}
