package graft.stream

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.config.WarehouseConfig
import graft.sink.WarehousePublisher

/** Change-feed row shape for the streaming CDC materialization spec. */
case class Chg(k: Long, name: String, bal: Double, op: String, seq: Long)

/** Streaming CDC materialization: each micro-batch merges into the
  * current published version and republishes atomically; readers see
  * only complete versions, and batch order composes with in-batch
  * sequence order.
  */
class StreamCdcSpec extends SparkTestBase {

  test("change batches fold into the published table version by version") {
    val s = spark
    import s.implicits._
    val cfg = WarehouseConfig(schema = "cdc", table = "acct")
    WarehousePublisher.publish(s,
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "name", "bal"),
      cfg)

    val ms = MemoryStream[Chg](org.apache.spark.sql.Encoders.product[Chg], s.sqlContext)
    val ckpt = Files.createTempDirectory("graft-cdc-ckpt").toString
    val q = StreamSink.mergeEachBatch(s, ms.toDF(), cfg, "k", ckpt)
    try {
      // Batch 1: stacked updates on k=1 (seq 2 wins) + insert k=9.
      ms.addData(Chg(1, "a", 11.0, "U", 1), Chg(1, "a", 12.0, "U", 2),
        Chg(9, "i", 90.0, "I", 1))
      q.processAllAvailable()
      val v1 = s.table(cfg.qualified).collect()
        .map(r => (r.getLong(0), r.getDouble(2))).toMap
      assert(v1 == Map(1L -> 12.0, 2L -> 20.0, 3L -> 30.0, 9L -> 90.0))

      // Batch 2: delete k=1 — a LATER batch overrides batch 1 even
      // though its seq restarts.
      ms.addData(Chg(1, "a", 0.0, "D", 1))
      q.processAllAvailable()
      val v2 = s.table(cfg.qualified).collect().map(_.getLong(0)).toSet
      assert(v2 == Set(2L, 3L, 9L))
    } finally q.stop()
  }
}
