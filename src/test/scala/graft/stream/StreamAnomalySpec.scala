package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.Tables.t

/** Online anomaly gate: the deque state must evict by event time,
  * judge strictly-prior history with the batch predicate, and — on
  * ordered replay — reproduce the oracle-checked ts_anomaly rows
  * exactly.
  */
class StreamAnomalySpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("judge: needs 5 priors, flags 3-sigma breaks, zero-variance guard") {
    assert(StreamAnomaly.judge(Seq(10, 10, 10, 10), 1000).isEmpty)  // < MinPrior
    assert(StreamAnomaly.judge(Seq(10, 10, 10, 10, 10), 1000).isEmpty) // den = 0
    val steady = Seq[Long](10, 12, 11, 9, 10, 11)
    assert(StreamAnomaly.judge(steady, 11).isEmpty)           // in-band
    assert(StreamAnomaly.judge(steady, 1000).isDefined)       // spike
  }

  test("stream matches the batch ts_anomaly rows on ordered fixture replay") {
    val s = spark
    val events = t(spark, sf0001, "events")
    val rows = events.orderBy("ts", "event_id").collect().map { r =>
      Ev(r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("ts"), r.getAs[String]("event_type"),
        r.getAs[Double]("value"))
    }.toSeq
    val ms = MemoryStream[Ev](org.apache.spark.sql.Encoders.product[Ev], s.sqlContext)
    val q = StreamAnomaly.anomalyStream(ms.toDF())
      .writeStream.format("memory").queryName("stream_anom")
      .outputMode("append").start()
    try {
      rows.grouped(300).foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val streamed = s.table("stream_anom").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet
    val batch = graft.queries.Temporal.tsAnomaly(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }

  test("deque evicts: events older than 24h leave the window across batches") {
    val s = spark
    val ms = MemoryStream[Ev](org.apache.spark.sql.Encoders.product[Ev], s.sqlContext)
    val q = StreamAnomaly.anomalyStream(ms.toDF())
      .writeStream.format("memory").queryName("anom_evict")
      .outputMode("append").start()
    try {
      // Five steady priors on day 1...
      ms.addData((1 to 5).map(i =>
        Ev(i.toLong, 1, ts(s"2024-01-01 0$i:00:00"), "view", 10.0)): _*)
      q.processAllAvailable()
      // ...then a spike two days later: priors evicted, too few remain.
      ms.addData(Ev(6, 1, ts("2024-01-03 10:00:00"), "view", 1000.0))
      q.processAllAvailable()
      assert(s.table("anom_evict").count() == 0)
      // Whereas the same spike inside the window flags (priors varied:
      // identical priors have zero variance and hit the den=0 guard).
      val vals = Seq(10.0, 12.0, 11.0, 9.0, 10.0)
      ms.addData((11 to 15).map(i =>
        Ev(i.toLong + 10, 2, ts(s"2024-01-01 0${i - 10}:10:00"), "view",
          vals(i - 11))): _*)
      ms.addData(Ev(30, 2, ts("2024-01-01 09:00:00"), "view", 1000.0))
      q.processAllAvailable()
      assert(s.table("anom_evict").collect().map(_.getLong(0)).toSeq == Seq(30L))
    } finally q.stop()
  }
}
