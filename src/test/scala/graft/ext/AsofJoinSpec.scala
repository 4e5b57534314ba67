package graft.ext

import java.sql.Timestamp

import graft.SparkTestBase

/** Backward as-of join semantics: greatest right-time ≤ left-time per
  * key, tie-inclusive, left-join shape, key isolation.
  */
class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 10:05:00"), 101.0),
    (1L, ts("2024-01-01 10:10:00"), 99.0),
    (2L, ts("2024-01-01 10:07:00"), 55.0))
    .toDF("q_key", "q_ts", "price")

  private val trades = Seq(
    (10L, 1L, ts("2024-01-01 09:59:00")), // before any quote -> null
    (11L, 1L, ts("2024-01-01 10:05:00")), // exact tie -> 101.0
    (12L, 1L, ts("2024-01-01 10:07:30")), // between -> 101.0, not 99.0
    (13L, 1L, ts("2024-01-01 11:00:00")), // after all -> latest 99.0
    (14L, 2L, ts("2024-01-01 10:08:00")), // key 2 sees only its quote
    (15L, 3L, ts("2024-01-01 10:08:00"))) // key with no quotes -> null
    .toDF("trade_id", "t_key", "t_ts")

  test("backward as-of picks the greatest right time <= left time, per key") {
    val out = AsofJoin.asofBackward(
        trades, "t_key", "t_ts", quotes, "q_key", "q_ts", Seq("q_ts", "price"))
      .collect().map(r => r.getLong(0) -> Option(r.get(4)).map(_.asInstanceOf[Double]))
      .toMap
    assert(out == Map(
      10L -> None, 11L -> Some(101.0), 12L -> Some(101.0),
      13L -> Some(99.0), 14L -> Some(55.0), 15L -> None))
  }

  test("chunked as-of equals the plain shape for every chunk width") {
    // Deterministic random timelines: 5 keys, 400 trades, 150 quotes,
    // spread over ~3 days so hour-scale chunks create many boundaries
    // (matches that must carry across 1, 2, ... empty chunks).
    val rnd = new scala.util.Random(42)
    val base = 1704067200L // 2024-01-01 UTC, seconds
    def randTs() = new Timestamp((base + rnd.nextInt(260000)) * 1000L)
    val ls = (0 until 400).map(i => (i.toLong, rnd.nextInt(5).toLong, randTs()))
      .toDF("trade_id", "t_key", "t_ts")
    val rs = (0 until 150).map(i => (rnd.nextInt(5).toLong, randTs(), rnd.nextDouble()))
      .toDF("q_key", "q_ts", "price")
      .groupBy("q_key", "q_ts").agg(org.apache.spark.sql.functions.max("price").as("price"))
    val plain = AsofJoin.asofBackward(
        ls, "t_key", "t_ts", rs, "q_key", "q_ts", Seq("q_ts", "price"))
      .collect().map(_.toSeq).toSet
    for (chunk <- Seq("37 minutes", "1 hour", "1 day", "30 days")) {
      val chunked = AsofJoin.asofBackwardChunked(
          ls, "t_key", "t_ts", rs, "q_key", "q_ts", Seq("q_ts", "price"), chunk)
        .collect().map(_.toSeq).toSet
      assert(chunked == plain, s"chunk '$chunk' diverged from the plain as-of")
    }
  }

  test("output keeps every left row and the left column set plus payloads") {
    val out = AsofJoin.asofBackward(
      trades, "t_key", "t_ts", quotes, "q_key", "q_ts", Seq("price"))
    assert(out.count() == trades.count())
    assert(out.columns.toSeq == Seq("trade_id", "t_key", "t_ts", "price"))
  }

  test("null-keyed/timed right rows never match; payload collisions are rejected") {
    val dirty = quotes.unionByName(Seq(
      (1L, null.asInstanceOf[Timestamp], 999.0), // null time: ASOF can never match it
      (0L, ts("2024-01-01 00:00:00"), 777.0))    // key 0: no left rows, harmless
      .toDF("q_key", "q_ts", "price"))
    val clean = AsofJoin.asofBackward(
        trades, "t_key", "t_ts", quotes, "q_key", "q_ts", Seq("price"))
      .collect().map(_.toSeq).toSet
    val withDirty = AsofJoin.asofBackward(
        trades, "t_key", "t_ts", dirty, "q_key", "q_ts", Seq("price"))
      .collect().map(_.toSeq).toSet
    assert(withDirty == clean)
    val collide = trades.withColumnRenamed("trade_id", "price")
    intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(collide, "t_key", "t_ts", quotes, "q_key", "q_ts", Seq("price"))
    }
  }
}
