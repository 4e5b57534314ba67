package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

/** Stream-stream interval join: batch parity, append-mode emission, and
  * late-data drop once the global watermark passes the join bound.
  */
class IntervalJoinSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def mkStream: MemoryStream[Ev] =
    MemoryStream[Ev](org.apache.spark.sql.Encoders.product[Ev], spark.sqlContext)

  private val views = Seq(
    Ev(10, 1, ts("2024-01-01 10:00:00"), "view", 0.0),
    Ev(11, 2, ts("2024-01-01 10:00:00"), "view", 0.0))
  private val purchases = Seq(
    Ev(20, 1, ts("2024-01-01 10:10:00"), "purchase", 5.0), // match (10 min)
    Ev(21, 2, ts("2024-01-01 10:50:00"), "purchase", 7.0), // outside 30-min horizon
    Ev(22, 1, ts("2024-01-01 10:25:00"), "purchase", 9.0)) // match (25 min)

  test("batch: pairs within the horizon only, per user") {
    val s = spark
    import s.implicits._
    val got = IntervalJoin.attribution(views.toDF(), purchases.toDF(), "30 minutes")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 10L, 20L), (1L, 10L, 22L)))
  }

  test("stream-stream: MemoryStream append run matches batch on same rows") {
    val s = spark
    import s.implicits._
    val batch = IntervalJoin.attribution(views.toDF(), purchases.toDF(), "30 minutes")
      .collect().map(_.toSeq).toSet

    val vs = mkStream
    val ps = mkStream
    val q = IntervalJoin.attribution(
        vs.toDF().withWatermark("ts", "10 minutes"),
        ps.toDF().withWatermark("ts", "10 minutes"),
        "30 minutes")
      .writeStream.format("memory").queryName("ijoin").outputMode("append").start()
    try {
      vs.addData(views)
      ps.addData(purchases.take(1))
      q.processAllAvailable()
      ps.addData(purchases.drop(1)) // cross-batch match for (10, 22)
      q.processAllAvailable()
      assert(s.table("ijoin").collect().map(_.toSeq).toSet == batch)
    } finally q.stop()
  }

  test("left outer: batch null-extends non-converting views; stream emits them after expiry") {
    val s = spark
    import s.implicits._
    // Batch truth: user 1's view converts twice; user 2's view gets one
    // null-extended row (its only purchase is outside the horizon).
    val batch = IntervalJoin.attributionLeft(views.toDF(), purchases.toDF(), "30 minutes")
      .collect().map(r => (r.getLong(1), Option(r.get(2)))).toSet
    assert(batch == Set((10L, Some(20L)), (10L, Some(22L)), (11L, None)))

    val vs = mkStream
    val ps = mkStream
    val q = IntervalJoin.attributionLeft(
        vs.toDF().withWatermark("ts", "10 minutes"),
        ps.toDF().withWatermark("ts", "10 minutes"),
        "30 minutes")
      .writeStream.format("memory").queryName("ijoin_left").outputMode("append").start()
    try {
      vs.addData(views)
      ps.addData(purchases)
      q.processAllAvailable()
      // The negative for view 11 must NOT exist yet: the watermark has
      // not passed view_ts + horizon, so a matching purchase could
      // still arrive.
      val early = s.table("ijoin_left").collect().map(r => Option(r.get(2))).toSet
      assert(!early.contains(None), s"negative emitted before expiry: $early")
      // Push the global watermark (min of both sides) past 10:30 —
      // the unmatched view's state expires and the null row appends.
      vs.addData(Ev(98, 9, ts("2024-01-01 12:00:00"), "view", 0.0))
      ps.addData(Ev(99, 9, ts("2024-01-01 12:00:00"), "purchase", 1.0))
      q.processAllAvailable()
      vs.addData(Ev(96, 9, ts("2024-01-01 13:00:00"), "view", 0.0))
      ps.addData(Ev(97, 9, ts("2024-01-01 13:00:00"), "purchase", 1.0))
      q.processAllAvailable()
      val streamed = s.table("ijoin_left").collect()
        .filter(_.getLong(0) <= 2L)
        .map(r => (r.getLong(1), Option(r.get(2)))).toSet
      assert(streamed == batch, s"stream $streamed != batch $batch")
    } finally q.stop()
  }

  test("stream-stream: a purchase behind the watermark never matches") {
    val s = spark
    import s.implicits._
    val vs = mkStream
    val ps = mkStream
    val q = IntervalJoin.attribution(
        vs.toDF().withWatermark("ts", "10 minutes"),
        ps.toDF().withWatermark("ts", "10 minutes"),
        "30 minutes")
      .writeStream.format("memory").queryName("ijoin_late").outputMode("append").start()
    try {
      vs.addData(Ev(10, 1, ts("2024-01-01 10:00:00"), "view", 0.0))
      q.processAllAvailable()
      // Advance BOTH sides' watermarks (global watermark is their min)
      // far past view_ts + horizon: view state is evictable and any
      // older purchase is late.
      vs.addData(Ev(98, 9, ts("2024-01-01 12:00:00"), "view", 0.0))
      ps.addData(Ev(99, 9, ts("2024-01-01 12:00:00"), "purchase", 1.0))
      q.processAllAvailable()
      // Would have matched (10:05 ∈ [10:00, 10:30)) but arrives behind
      // the ~11:50 watermark → dropped, exactly-once output preserved.
      ps.addData(Ev(30, 1, ts("2024-01-01 10:05:00"), "purchase", 5.0))
      q.processAllAvailable()
      val got = s.table("ijoin_late").collect()
        .map(r => (r.getLong(1), r.getLong(2))).toSet
      assert(!got.contains((10L, 30L)))
    } finally q.stop()
  }
}
