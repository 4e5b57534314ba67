package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.Tables.t

/** Streaming LOCF carry: the register must survive micro-batch
  * boundaries, tolerate intra-batch disorder, and — over ordered
  * arrival — reproduce the batch lag twin exactly.
  */
class StreamLocfSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def runStream(batches: Seq[Seq[Ev]], name: String) = {
    val s = spark
    val ms = MemoryStream[Ev](org.apache.spark.sql.Encoders.product[Ev], s.sqlContext)
    val q = StreamLocf.carryStream(ms.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
      s.table(name).collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    } finally q.stop()
  }

  test("carry register survives micro-batch boundaries") {
    val out = runStream(Seq(
      Seq(Ev(1, 7, ts("2024-01-01 10:00:00"), "view", 1.00)),
      Seq(Ev(2, 7, ts("2024-01-01 11:00:00"), "view", 2.50)),
      Seq(Ev(3, 7, ts("2024-01-01 12:00:00"), "view", 9.99))), "locf_batches")
    assert(out == Map(1L -> None, 2L -> Some(100L), 3L -> Some(250L)))
  }

  test("intra-batch disorder folds in event-time order; keys are independent") {
    val out = runStream(Seq(Seq(
      Ev(5, 1, ts("2024-01-01 10:20:00"), "view", 3.00), // arrives first, is LATER
      Ev(4, 1, ts("2024-01-01 10:10:00"), "view", 2.00),
      Ev(6, 2, ts("2024-01-01 10:15:00"), "view", 7.00))), "locf_disorder")
    assert(out == Map(4L -> None, 5L -> Some(200L), 6L -> None))
  }

  test("cross-batch straggler reads the register but cannot rewind it") {
    val out = runStream(Seq(
      Seq(Ev(1, 7, ts("2024-01-01 12:00:00"), "view", 5.00)),
      Seq(Ev(2, 7, ts("2024-01-01 10:00:00"), "view", 1.00)), // older than register
      Seq(Ev(3, 7, ts("2024-01-01 13:00:00"), "view", 2.00))), "locf_straggler")
    // The straggler sees the served register (500), and event 3 still
    // carries 500 — the straggler did not overwrite it.
    assert(out == Map(1L -> None, 2L -> Some(500L), 3L -> Some(500L)))
  }

  test("ordered replay of the fixture matches the batch lag twin exactly") {
    val events = t(spark, sf0001, "events")
    val rows = events.orderBy("ts", "event_id").collect().map { r =>
      Ev(r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("ts"), r.getAs[String]("event_type"),
        r.getAs[Double]("value"))
    }.toSeq
    // Two slicings of the same ordered replay must agree with batch.
    val streamed = runStream(rows.grouped(400).toSeq, "locf_parity")
    val batch = StreamLocf.carryBatch(events).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(streamed.size == batch.size)
    assert(streamed == batch)
  }
}
