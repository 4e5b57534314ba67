package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

/** Custom-state sessionization (SURVEY §2.8): the flatMapGroupsWithState
  * path must agree with the session_window operator and with its own
  * batch twin, emit each session exactly once in append mode, and drop
  * late events.
  */
class StatefulSessionsSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  private val fixture = Seq(
    Ev(1, 1, ts("2024-01-01 10:05:00"), "click", 1.0),
    Ev(2, 1, ts("2024-01-01 10:25:00"), "click", 2.5), // 20 min gap: same session
    Ev(3, 1, ts("2024-01-01 11:30:00"), "view", 3.0),  // 65 min gap: new session
    Ev(4, 2, ts("2024-01-01 10:45:00"), "view", 4.0),
    Ev(5, 2, ts("2024-01-01 11:20:00"), "click", 0.5), // 35 min gap: new session
    Ev(6, 3, ts("2024-01-01 11:40:00"), "view", 2.0))

  test("batch custom-state fold matches session_window bit-for-bit") {
    val s = spark
    import s.implicits._
    val viaWindow = EventWindows.sessionByUser(fixture.toDF(), "30 minutes")
      .collect().map(_.toSeq).toSet
    val viaState = StatefulSessions.sessionsBatch(fixture.toDF(), "30 minutes")
      .collect().map(_.toSeq).toSet
    assert(viaState == viaWindow)
    assert(viaState.nonEmpty)
  }

  test("a gap of exactly the timeout MERGES (session_window-aligned contract)") {
    // Aligned boundary: Spark's session_window merges touching windows,
    // so the fold (inclusive <=) and the gaps-and-islands oracle
    // (strict > break) do too — see SessionBoundarySpec for the
    // three-way agreement on boundary/inside/outside rows.
    val s = spark
    import s.implicits._
    val boundary = Seq(
      Ev(1, 7, ts("2024-01-01 10:00:00"), "click", 1.0),
      Ev(2, 7, ts("2024-01-01 10:30:00"), "click", 2.0))
    val out = StatefulSessions.sessionsBatch(boundary.toDF(), "30 minutes")
      .collect().map(r => (r.getTimestamp(0), r.getLong(3)))
    assert(out.toSeq == Seq((ts("2024-01-01 10:00:00"), 2L)))
  }

  test("merge bridges a late-but-in-watermark event across two open sessions") {
    import StatefulSessions.SessAgg
    val gapUs = 30L * 60 * 1000000
    val a = SessAgg(0L, 0L, 1, 1.0)                    // session at t=0
    val b = SessAgg(40 * 60 * 1000000L, 40 * 60 * 1000000L, 1, 2.0) // t=40min
    assert(StatefulSessions.merge(Seq(a, b), gapUs).size == 2)
    // An event at t=20min arrives later: all three now chain into one.
    val bridge = SessAgg(20 * 60 * 1000000L, 20 * 60 * 1000000L, 1, 4.0)
    val merged = StatefulSessions.merge(Seq(a, b, bridge), gapUs)
    assert(merged == List(SessAgg(0L, b.lastUs, 3, 7.0)))
  }

  test("stream emits each closed session exactly once and matches batch") {
    val s = spark
    import s.implicits._
    val ms = MemoryStream[Ev](org.apache.spark.sql.Encoders.product[Ev], s.sqlContext)
    val q = StatefulSessions.sessionsStream(ms.toDF(), "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("state_sessions")
      .outputMode("append").start()
    try {
      // Out-of-order within a batch + across batches (still in watermark).
      ms.addData(fixture(1), fixture(0), fixture(3))
      q.processAllAvailable()
      ms.addData(fixture(2), fixture(4), fixture(5))
      q.processAllAvailable()
      // Advance the watermark far past every quiet period, then run one
      // more batch so event-time timeouts fire and flush open sessions.
      ms.addData(Ev(90, 99, ts("2024-01-01 18:00:00"), "tick", 0.0))
      q.processAllAvailable()
      ms.addData(Ev(91, 99, ts("2024-01-01 19:00:00"), "tick", 0.0))
      q.processAllAvailable()

      val streamed = s.table("state_sessions")
        .filter($"user_id" <= 3).collect().map(_.toSeq)
      val batch = StatefulSessions.sessionsBatch(fixture.toDF(), "30 minutes")
        .collect().map(_.toSeq)
      // Exactly once: no duplicate emissions across microbatches.
      assert(streamed.length == streamed.toSet.size)
      assert(streamed.toSet == batch.toSet)
    } finally q.stop()
  }

  test("hot key: 10^6 events for ONE user sessionize without per-key buffering") {
    // The r2 shape (flatMapGroups + per-key toSeq) would materialize all
    // 10^6 events of the key on one executor thread; the sorted
    // single-pass fold holds one aggregate. Events tick every second,
    // with an extra 1h jump every 100k events -> exactly 10 sessions.
    import org.apache.spark.sql.functions._
    val base = 1704067200000000L // 2024-01-01 00:00:00 UTC, micros
    val df = spark.range(1000000).select(
      lit(42L).as("user_id"),
      timestamp_micros(lit(base) + col("id") * 1000000L +
        expr("id div 100000") * 3600000000L).as("ts"),
      lit(1.5).as("value"))
    val out = StatefulSessions.sessionsBatch(df, "30 minutes").collect()
    assert(out.length == 10)
    assert(out.forall(_.getLong(3) == 100000L))
    assert(out.map(_.getDouble(4)).sum == 1500000.0)
  }

  test("a closed session flushes at ITS quiet-period end, not the newest session's") {
    // Two open sessions for one key: A at 10:00, B at 12:00. Once the
    // watermark passes A's quiet period (10:30) — but NOT B's (12:30)
    // — the timeout must flush A alone. Arming the timeout at the
    // NEWEST session's quiet end (the pre-fix shape) would hold A
    // hostage until 12:30+.
    val s = spark
    import s.implicits._
    val ms = MemoryStream[Ev](org.apache.spark.sql.Encoders.product[Ev], s.sqlContext)
    val q = StatefulSessions.sessionsStream(ms.toDF(), "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("state_latency")
      .outputMode("append").start()
    try {
      ms.addData(
        Ev(1, 1, ts("2024-01-01 10:00:00"), "click", 1.0),
        Ev(2, 1, ts("2024-01-01 12:00:00"), "click", 2.0))
      q.processAllAvailable()
      // Push the watermark to 10:45 (10:55 - 10m): past A's quiet end,
      // well short of B's. The extra batch lets the event-time timeout
      // fire on the advanced watermark.
      ms.addData(Ev(90, 99, ts("2024-01-01 10:55:00"), "tick", 0.0))
      q.processAllAvailable()
      ms.addData(Ev(91, 99, ts("2024-01-01 10:56:00"), "tick", 0.0))
      q.processAllAvailable()
      val afterA = s.table("state_latency").filter($"user_id" === 1)
        .collect().map(r => (r.getTimestamp(0), r.getLong(3)))
      assert(afterA.toSeq == Seq((ts("2024-01-01 10:00:00"), 1L)),
        s"session A must flush at its own quiet-period end, got: ${afterA.toSeq}")
      // Now pass B's quiet end too.
      ms.addData(Ev(92, 99, ts("2024-01-01 13:00:00"), "tick", 0.0))
      q.processAllAvailable()
      ms.addData(Ev(93, 99, ts("2024-01-01 13:01:00"), "tick", 0.0))
      q.processAllAvailable()
      val all = s.table("state_latency").filter($"user_id" === 1)
        .collect().map(r => (r.getTimestamp(0), r.getLong(3))).toSet
      assert(all == Set(
        (ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 12:00:00"), 1L)))
    } finally q.stop()
  }

  test("late event behind the watermark is dropped, not sessionized") {
    val s = spark
    import s.implicits._
    val ms = MemoryStream[Ev](org.apache.spark.sql.Encoders.product[Ev], s.sqlContext)
    val q = StatefulSessions.sessionsStream(ms.toDF(), "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("state_late")
      .outputMode("append").start()
    try {
      ms.addData(Ev(1, 1, ts("2024-01-01 10:00:00"), "click", 1.0))
      q.processAllAvailable()
      // Watermark is now 09:50; push it far ahead.
      ms.addData(Ev(2, 99, ts("2024-01-01 15:00:00"), "tick", 0.0))
      q.processAllAvailable()
      // Watermark 14:50: this 10:05 event is late — must NOT extend or
      // create a session, even though it reaches the state function.
      ms.addData(Ev(3, 1, ts("2024-01-01 10:05:00"), "click", 99.0))
      q.processAllAvailable()
      ms.addData(Ev(4, 99, ts("2024-01-01 16:00:00"), "tick", 0.0))
      q.processAllAvailable()

      val u1 = s.table("state_late").filter($"user_id" === 1)
        .collect().map(r => (r.getTimestamp(0), r.getLong(3), r.getDouble(4)))
      assert(u1.toSeq == Seq((ts("2024-01-01 10:00:00"), 1L, 1.0)))
    } finally q.stop()
  }
}
