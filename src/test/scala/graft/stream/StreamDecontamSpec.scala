package graft.stream

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

case class SdcDoc(doc_id: Long, text: String)

/** Streaming decontamination: the per-micro-batch contamination gate
  * emits exactly the batch operator's rows, independent of how the
  * corpus is sliced into micro-batches, and restart resumes without
  * re-scoring.
  */
class StreamDecontamSpec extends SparkTestBase {

  private val L = 3

  private val corpus = Seq(
    SdcDoc(1L, "a b c d e"),          // 2 of 3 windows leaked
    SdcDoc(2L, "p q r s t"),          // clean
    SdcDoc(3L, "a b c d z9 q3"),      // windows abc,bcd,cdz9 leak: 3 of 4 -> flagged (30 >= 28)
    SdcDoc(4L, "x y"))                // shorter than a window: no row

  private def evalSet = {
    val s = spark; import s.implicits._
    Seq(SdcDoc(100L, "a b c d z9")).toDF()
  }

  private def batchTruth = {
    val s = spark; import s.implicits._
    graft.ext.SubstrDedup.contaminationRate(
        corpus.toDF(), evalSet, "doc_id", "text", L)
      .collect().map(_.toSeq).toSet
  }

  test("stream output equals the batch operator across micro-batch slicings") {
    val s = spark; import s.implicits._
    val truth = batchTruth
    assert(truth.size === 3) // doc 4 has no full window

    for (split <- Seq(1, 2, 3)) {
      val ms = MemoryStream[SdcDoc](
        org.apache.spark.sql.Encoders.product[SdcDoc], spark.sqlContext)
      val out = Files.createTempDirectory("sdc_out").toString
      val ckpt = Files.createTempDirectory("sdc_ckpt").toString
      val q = StreamDecontam.start(s, ms.toDF(), evalSet,
        "doc_id", "text", L, out, ckpt)
      try {
        corpus.grouped(split).foreach(g => { ms.addData(g); q.processAllAvailable() })
        val got = StreamDecontam.readOutput(s, out).collect().map(_.toSeq).toSet
        assert(got == truth, s"split=$split")
      } finally q.stop()
    }
  }

  test("a flagged document is flagged in the stream too") {
    val s = spark; import s.implicits._
    val ms = MemoryStream[SdcDoc](
      org.apache.spark.sql.Encoders.product[SdcDoc], spark.sqlContext)
    val out = Files.createTempDirectory("sdc_out2").toString
    val ckpt = Files.createTempDirectory("sdc_ckpt2").toString
    val q = StreamDecontam.start(s, ms.toDF(), evalSet,
      "doc_id", "text", L, out, ckpt)
    try {
      ms.addData(corpus)
      q.processAllAvailable()
      val flagged = StreamDecontam.readOutput(s, out)
        .filter(col("contaminated")).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(flagged === Set(3L))
    } finally q.stop()
  }

  test("restart from the checkpoint does not re-score delivered documents") {
    val s = spark; import s.implicits._
    val ms = MemoryStream[SdcDoc](
      org.apache.spark.sql.Encoders.product[SdcDoc], spark.sqlContext)
    val out = Files.createTempDirectory("sdc_out3").toString
    val ckpt = Files.createTempDirectory("sdc_ckpt3").toString
    val q1 = StreamDecontam.start(s, ms.toDF(), evalSet,
      "doc_id", "text", L, out, ckpt)
    try {
      ms.addData(corpus.take(2)); q1.processAllAvailable()
    } finally q1.stop()
    // Same source, same checkpoint: only the NEW data lands.
    val q2 = StreamDecontam.start(s, ms.toDF(), evalSet,
      "doc_id", "text", L, out, ckpt)
    try {
      ms.addData(corpus.drop(2)); q2.processAllAvailable()
      val got = StreamDecontam.readOutput(s, out).collect().map(_.toSeq).toSet
      assert(got == batchTruth) // no duplicates from re-scoring
    } finally q2.stop()
  }

  test("a replayed micro-batch is idempotent: same batchId overwrites, not appends") {
    val s = spark; import s.implicits._
    val out = Files.createTempDirectory("sdc_out4").toString
    // Simulate the at-least-once failure mode: the checkpoint commit is
    // lost after the parquet write, so the SAME (batch, batchId) is
    // delivered to the sink again on restart.
    StreamDecontam.writeBatch(corpus.toDF(), 7L, evalSet, "doc_id", "text", L, out)
    StreamDecontam.writeBatch(corpus.toDF(), 7L, evalSet, "doc_id", "text", L, out)
    val got = StreamDecontam.readOutput(s, out).collect().map(_.toSeq)
    assert(got.length === got.toSet.size) // no duplicated rows
    assert(got.map(_.toSeq).toSet == batchTruth)
    // A DIFFERENT batchId lands alongside, untouched by the replay.
    StreamDecontam.writeBatch(corpus.take(1).toDF(), 8L, evalSet, "doc_id", "text", L, out)
    StreamDecontam.writeBatch(corpus.toDF(), 7L, evalSet, "doc_id", "text", L, out)
    assert(StreamDecontam.readOutput(s, out).count() === (batchTruth.size + 1).toLong)
  }
}
