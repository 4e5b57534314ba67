package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.Tables.t

/** Streaming funnel: watermark-driven finality must reproduce the batch
  * twin exactly — independent of microbatch slicing and arrival order —
  * drop late events, and emit each (user, stage) advance exactly once.
  */
class StreamFunnelSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("advanceFunnel: tie rule, ordering, monotone finality") {
    val unset = Vector.fill(4)(Long.MaxValue)
    // A same-timestamp signup unlocks the view (>= semantics) …
    val (t1, a1) = StreamFunnel.advanceFunnel(unset, Seq((100L, 1), (100L, 0)))
    assert(t1.take(2) == Vector(100L, 100L) && a1 == List((0, 100L), (1, 100L)))
    // … but a view strictly before any signup stays locked.
    val (t2, a2) = StreamFunnel.advanceFunnel(unset, Seq((99L, 1), (100L, 0)))
    assert(t2(0) == 100L && t2(1) == Long.MaxValue && a2 == List((0, 100L)))
    // Later ripe batches cannot improve an earlier-finalized stage, and
    // a stage advances at most once per key.
    val (t3, a3) = StreamFunnel.advanceFunnel(t1, Seq((50L, 1), (120L, 1)))
    assert(t3 == t1 && a3.isEmpty)
  }

  test("stream matches the batch twin across slicings, drops late, emits once") {
    val s = spark
    import s.implicits._
    val b1 = Seq(
      Ev(1, 1, ts("2024-01-01 10:00:00"), "signup", 0.0),
      Ev(2, 2, ts("2024-01-01 10:00:00"), "view", 0.0),   // pre-signup: locked
      Ev(3, 2, ts("2024-01-01 10:05:00"), "signup", 0.0),
      Ev(4, 3, ts("2024-01-01 10:05:00"), "signup", 0.0),
      Ev(5, 3, ts("2024-01-01 10:05:00"), "view", 0.0))   // tie: unlocked
    val b2 = Seq(
      Ev(6, 1, ts("2024-01-01 10:20:00"), "click", 0.0),  // arrives BEFORE its view
      Ev(7, 1, ts("2024-01-01 10:10:00"), "view", 0.0),
      Ev(8, 2, ts("2024-01-01 10:15:00"), "view", 0.0))
    val b3 = Seq(
      Ev(9, 1, ts("2024-01-01 10:30:00"), "purchase", 0.0),
      Ev(10, 4, ts("2024-01-01 09:30:00"), "signup", 0.0)) // behind watermark: dropped
    // Watermark ticks must be funnel-typed (the stage filter sits below
    // the watermark node); user 99 is excluded from the assertions.
    val ticks = Seq(
      Ev(90, 99, ts("2024-01-01 12:00:00"), "signup", 0.0),
      Ev(91, 99, ts("2024-01-01 13:00:00"), "signup", 0.0))

    val ms = MemoryStream[Ev](org.apache.spark.sql.Encoders.product[Ev], s.sqlContext)
    val q = StreamFunnel.funnelStream(ms.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("stream_funnel")
      .outputMode("append").start()
    try {
      Seq(b1, b2, b3, Seq(ticks(0)), Seq(ticks(1))).foreach { batch =>
        ms.addData(batch: _*); q.processAllAvailable()
      }
      val streamed = s.table("stream_funnel").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getTimestamp(3)))
        .filter(_._1 != 99L)
      assert(streamed.length == streamed.toSet.size, "duplicate advance emitted")
      // Differential truth: the batch twin over the surviving events
      // (user 4's event died behind the watermark).
      val survived = (b1 ++ b2 ++ b3.take(1)).toDF()
      val batch = StreamFunnel.funnelBatch(survived).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getTimestamp(3)))
      assert(streamed.toSet == batch.toSet)
      // Hand-checked highlights: the tie unlocked u3's view; u2's
      // pre-signup view did not count but the later one did; u1 ran the
      // full chain with an out-of-order click/view arrival.
      assert(streamed.toSet.contains((3L, 2, "view", ts("2024-01-01 10:05:00"))))
      assert(streamed.toSet.contains((2L, 2, "view", ts("2024-01-01 10:15:00"))))
      assert(streamed.count(_._1 == 1L) == 4)
      assert(!streamed.exists(_._1 == 4L))
    } finally q.stop()
  }

  test("batch twin agrees with the registered eventFunnel counts") {
    val s = spark
    import s.implicits._
    val counts = StreamFunnel.funnelBatch(t(s, sf0001, "events"))
      .groupBy($"stage").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val funnel = graft.queries.Relational.eventFunnel(s, sf0001).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert((1 to 4).forall(k => counts.getOrElse(k, 0L) == funnel(k)),
      s"twin=$counts registered=$funnel")
  }
}
