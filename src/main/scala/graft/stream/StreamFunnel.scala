package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered-funnel progression (SURVEY §2.8 custom state, the
  * streaming twin of [[graft.queries.Relational.eventFunnel]]): per
  * user, emit one append-mode row the first time each funnel stage is
  * reached, where stage k is reached at the earliest stage-k event at
  * or after the user's stage-(k-1) time (the batch query's time-≥
  * RANGE-window semantics, including the same-timestamp tie rule).
  *
  * Out-of-order safety is WATERMARK-DRIVEN FINALITY, not arrival order:
  * an event is folded into the stage machine only once the watermark
  * has passed its timestamp — until then it sits in the key's buffer —
  * because a stage time is only final when no earlier-timestamped
  * event can still arrive (a late-but-in-watermark `view` can rewrite
  * t₂ and thereby which `click` qualifies). Events behind the watermark
  * are dropped, matching the windowed-aggregation late policy. Since
  * every ripe batch is folded in event-time order and successive
  * watermarks only move forward, the emitted advance set is a pure
  * function of the event set — independent of microbatch slicing,
  * which is exactly what `StreamFunnelSpec` asserts against the batch
  * twin.
  *
  * Scale: one shuffle on user_id (the state operator's partitioning);
  * state per user = 4 stage times + the buffer of events younger than
  * the watermark delay — bounded by delay × per-user event rate, the
  * same bound any watermarked stream operator carries. Stage times are
  * monotone and final, so each (user, stage) emits exactly once.
  */
object StreamFunnel {

  /** Funnel stage order; index = stage - 1. */
  val Stages: Vector[String] = Vector("signup", "view", "click", "purchase")

  /** Internal row shape (public: encoder codegen must instantiate it). */
  case class FEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String)

  /** Per-key state: final-so-far stage times (Long.MaxValue = unset)
    * and the not-yet-final event buffer (ts micros, stage index).
    */
  case class FunnelState(t: Vector[Long], buf: List[(Long, Int)])

  /** Pure core: fold watermark-final (ts, stage) events into the
    * monotone stage times; returns updated times plus newly reached
    * stages. Processing ascends (ts, stage), so within one timestamp a
    * signup unlocks a same-timestamp view (the RANGE-window tie rule),
    * and because timestamps ascend, each t(k) is already minimal over
    * all folded events when any later event consults it — one pass
    * reproduces the batch query's global minima.
    */
  def advanceFunnel(t0: Vector[Long], ripe: Seq[(Long, Int)])
      : (Vector[Long], List[(Int, Long)]) = {
    var t = t0
    val out = scala.collection.mutable.ListBuffer.empty[(Int, Long)]
    ripe.sortBy(identity).foreach { case (ts, k) =>
      if ((k == 0 || t(k - 1) <= ts) && ts < t(k)) {
        t = t.updated(k, ts)
        out += ((k, ts))
      }
    }
    (t, out.toList)
  }

  private def toEvents(events: DataFrame): Dataset[FEvent] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .filter(col("event_type").isin(Stages: _*)) // map-side, pre-shuffle
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        col("event_type").cast("string").as("event_type"))
      .as[FEvent]
  }

  /** Append-mode stage advances: (user_id, stage 1-4, event_type,
    * stage_ts). Each advance is emitted exactly once, on the microbatch
    * whose watermark finalized it (or on the key's event-time timeout
    * when no new data arrives for the user).
    *
    * The watermark is tracked over the FUNNEL-TYPED stream: Catalyst
    * pushes the stage-type filter below the EventTimeWatermark node, so
    * only funnel events advance event time. If other event types must
    * drive the clock (sparse funnels inside a chatty stream), keep them
    * flowing: map non-funnel types to a sentinel the state function
    * ignores instead of pre-filtering — the trade is a shuffle of the
    * full stream for a faster-moving watermark.
    */
  def funnelStream(events: DataFrame, delay: String): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val keyed = toEvents(events.withWatermark("ts", delay))
      .groupByKey(_.user_id)
    keyed.flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (uid: Long, it: Iterator[FEvent], state: GroupState[FunnelState]) =>
        val st = if (state.exists) state.get
          else FunnelState(Vector.fill(Stages.size)(Long.MaxValue), Nil)
        val wmUs = state.getCurrentWatermarkMs() * 1000L
        val incoming = it
          .map(e => (StatefulSessions.usOf(e.ts), Stages.indexOf(e.event_type)))
          .filter(_._1 >= wmUs) // rows behind the watermark are dropped
          .toList
        // Final ⟺ strictly behind the watermark: an on-the-watermark
        // event could still gain a same-timestamp lower-stage sibling.
        val (ripe, hold) = (st.buf ++ incoming).partition(_._1 < wmUs)
        val (t2, advances) = advanceFunnel(st.t, ripe)
        // Stage times are per-user lifetime state (a user may convert
        // long after signup); the buffer drains as the watermark moves.
        // A production deployment bounds user lifetime with a TTL
        // policy; the fixture contract keeps times indefinitely.
        state.update(FunnelState(t2, hold))
        if (hold.nonEmpty) {
          // Re-fire as soon as the watermark passes the oldest held
          // event (ms, ceil) so buffered events finalize without
          // waiting for new data on this key.
          state.setTimeoutTimestamp(hold.map(_._1).min / 1000L + 1L)
        }
        advances.iterator.map { case (k, tsUs) => (uid, k + 1, Stages(k), tsUs) }
    }.toDF("user_id", "stage", "event_type", "stage_us")
      .select(col("user_id"), col("stage"), col("event_type"),
        timestamp_micros(col("stage_us")).as("stage_ts"))
  }

  /** Batch twin with the same output shape: the [[graft.queries
    * .Relational.eventFunnel]] chained-RANGE-window construction, kept
    * to global stage minima per user and melted to one row per reached
    * stage — the differential truth `StreamFunnelSpec` compares the
    * stream against.
    */
  def funnelBatch(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val upToNow = Window.partitionBy($"user_id").orderBy($"ts")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val times = toEvents(events).toDF()
      .withColumn("t1", min(when($"event_type" === Stages(0), $"ts")).over(upToNow))
      .withColumn("t2", min(when($"event_type" === Stages(1) && $"t1".isNotNull, $"ts"))
        .over(upToNow))
      .withColumn("t3", min(when($"event_type" === Stages(2) && $"t2".isNotNull, $"ts"))
        .over(upToNow))
      .withColumn("t4", min(when($"event_type" === Stages(3) && $"t3".isNotNull, $"ts"))
        .over(upToNow))
      .groupBy($"user_id")
      .agg(min($"t1").as("t1"), min($"t2").as("t2"),
        min($"t3").as("t3"), min($"t4").as("t4"))
    times.select($"user_id", explode(array(
        (0 until Stages.size).map(i => struct(
          lit(i + 1).as("stage"), lit(Stages(i)).as("event_type"),
          col(s"t${i + 1}").as("stage_ts"))): _*)).as("f"))
      .select($"user_id", $"f.stage", $"f.event_type", $"f.stage_ts")
      .filter($"stage_ts".isNotNull)
  }
}
