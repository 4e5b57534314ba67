package graft.stream

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ext.NearDup

/** Streaming incremental dedup against a landed index: novel docs land,
  * near-dups of the base are dropped, across micro-batches, and a
  * restarted-batch replay stays idempotent in outcome (per-batch
  * decisions depend only on the static base).
  */
case class Doc(doc_id: Long, text: String)

class StreamIncrementalDedupSpec extends SparkTestBase {

  test("novel docs land; near-dups of the base are dropped; batch-internal dups pass") {
    val s = spark; import s.implicits._
    val tmp = Files.createTempDirectory("graft-sdedup").toString

    // Base corpus: two documents, landed as the bucketed index pair.
    val baseA = (1 to 40).map(i => s"alpha$i").mkString(" ")
    val baseB = (1 to 40).map(i => s"beta$i").mkString(" ")
    val base = Seq(Doc(1L, baseA), Doc(2L, baseB)).toDF()
    val (numHashes, numBands) = NearDup.bandingFor(0.5)
    val baseSh = NearDup.shingleSets(base, "doc_id", "text", 3)
    graft.sink.BucketedLayout.writeBucketed(
      NearDup.bandIndex(baseSh, numHashes, numBands),
      "sdedup_keys", s"$tmp/keys", 4, "bkey")
    graft.sink.BucketedLayout.writeBucketed(
      baseSh, "sdedup_sh", s"$tmp/sh", 4, "doc_id")

    val ms = MemoryStream[Doc](org.apache.spark.sql.Encoders.product[Doc], s.sqlContext)
    val q = StreamSink.dedupEachBatch(s, ms.toDF(),
      "sdedup_keys", "sdedup_sh", 0.5, s"$tmp/out", s"$tmp/ckpt")
    try {
      // Batch 1: a near-dup of baseA (dropped) + a novel doc (lands).
      ms.addData(Seq(
        Doc(10L, baseA + " tail1 tail2"),
        Doc(11L, (1 to 40).map(i => s"gamma$i").mkString(" "))))
      q.processAllAvailable()
      // Batch 2: another baseB near-dup + two batch-internal twins
      // (both pass: dedup is vs the BASE only).
      val twin = (1 to 40).map(i => s"delta$i").mkString(" ")
      ms.addData(Seq(Doc(20L, baseB + " x"), Doc(21L, twin), Doc(22L, twin)))
      q.processAllAvailable()

      val landed = s.read.parquet(s"$tmp/out").select($"doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(landed == Set(11L, 21L, 22L))
    } finally q.stop()
  }
}
