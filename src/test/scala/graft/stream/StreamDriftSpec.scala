package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Batch/stream parity of the windowed chi-square drift gate, plus the
  * integer-clearing arithmetic on a hand-checkable window.
  */
class StreamDriftSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def mkStream: MemoryStream[Ev] =
    MemoryStream[Ev](org.apache.spark.sql.Encoders.product[Ev], spark.sqlContext)

  test("uniform window scores zero; a one-type window is hand-computable") {
    // Window A: one of each type → chi2 = 0 exactly.
    // Window B: 5 clicks → num = (25-5)² + 4·(0-5)² = 500, chi2 = 500/25 = 20.
    val evs = StreamDrift.Types.zipWithIndex.map { case (t, i) =>
      Ev(i, 1, ts("2024-01-01 10:01:00"), t, 1.0)
    } ++ (10 to 14).map(i => Ev(i, 1, ts("2024-01-01 11:01:00"), "click", 1.0))
    val got = StreamDrift.driftByWindow(evs.toDF(), "1 hour")
      .collect().map(r => r.getTimestamp(0).toString ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got("2024-01-01 10:00:00.0") == ((5L, 0L, 0.0)))
    assert(got("2024-01-01 11:00:00.0") == ((5L, 500L, 20.0)))
  }

  test("streaming twin reproduces the batch gate on the full fixture") {
    val events = graft.Tables.t(spark, sf0001, "events")
    val batch = StreamDrift.driftByWindow(events, "1 hour")
      .collect().map(_.toSeq).toSet

    val fixture = events
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), col("value"))
      .as[Ev].collect().toSeq
    val ms = mkStream
    val q = StreamDrift.driftByWindow(
        ms.toDF().withWatermark("ts", "10 minutes"), "1 hour")
      .writeStream.format("memory").queryName("drift_parity")
      .outputMode("complete").start()
    try {
      val (a, b) = fixture.splitAt(fixture.length / 2)
      ms.addData(a)
      ms.addData(b)
      q.processAllAvailable()
      assert(spark.table("drift_parity").collect().map(_.toSeq).toSet == batch)
    } finally q.stop()
  }
}
