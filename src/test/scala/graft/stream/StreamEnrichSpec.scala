package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Stream-static enrichment: the shared join+rollup emits the same
  * rows from a MemoryStream run as from the batch twin, the streaming
  * plan stays stateless (broadcast join, no state store), and facts
  * without a dimension row survive the left join.
  */
class StreamEnrichSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def mkStream: MemoryStream[Ev] =
    MemoryStream[Ev](org.apache.spark.sql.Encoders.product[Ev], spark.sqlContext)

  private val events = Seq(
    Ev(1, 1, ts("2024-01-01 10:05:00"), "click", 1.0),
    Ev(2, 1, ts("2024-01-01 10:25:00"), "view", 2.5),
    Ev(3, 2, ts("2024-01-01 10:45:00"), "view", 3.0),
    Ev(4, 9, ts("2024-01-01 11:10:00"), "click", 4.0)) // no dim row: survives with null segment

  private def dim = {
    val s = spark; import s.implicits._
    Seq((1L, "BUILDING"), (2L, "MACHINERY"), (3L, "FURNITURE"))
      .toDF("c_custkey", "c_mktsegment")
  }

  test("stream run of the shared rollup matches batch, including the unmatched fact") {
    val s = spark; import s.implicits._
    val batch = StreamEnrich.segmentRollup(events.toDF(), dim,
        "user_id", "c_custkey", "c_mktsegment")
      .collect().map(_.toSeq).toSet
    assert(batch.exists(_.head == null), "unmatched fact should keep a null segment")

    val ms = mkStream
    val q = StreamEnrich.segmentRollup(ms.toDF(), dim,
        "user_id", "c_custkey", "c_mktsegment")
      .writeStream.format("memory").queryName("enrich_parity")
      .outputMode("complete").start()
    try {
      ms.addData(events.take(2))
      ms.addData(events.drop(2))
      q.processAllAvailable()
      assert(s.table("enrich_parity").collect().map(_.toSeq).toSet == batch)
    } finally q.stop()
  }

  test("enrichment join is a broadcast hash join — stateless per micro-batch") {
    val s = spark; import s.implicits._
    val plan = StreamEnrich.enriched(events.toDF(), dim,
        "user_id", "c_custkey", Seq("c_mktsegment"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }
}
