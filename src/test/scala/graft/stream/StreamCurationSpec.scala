package graft.stream

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

case class ScDoc(doc_id: Long, text: String, lang: String)

/** The streaming twin of cfg_curation: the config-compiled chain
  * (decontam gate → quality gate → exact dedup → temperature mix →
  * chunk → shard) re-materialized per micro-batch over an idempotent
  * landing zone equals the batch composition for EVERY micro-batch
  * slicing, survives restart, and replays idempotently — reusing
  * CurationCompiler verbatim.
  */
class StreamCurationSpec extends SparkTestBase {

  private val yaml =
    """source:
      |  name: stream_curation
      |  type: file
      |  curation:
      |    id_field: doc_id
      |    text_field: text
      |    stratum_field: lang
      |    quality:
      |      min_tokens: 3
      |      max_tokens: 100
      |      min_stop_ratio: 0.0
      |    dedup: exact
      |    mix: true
      |    chunk:
      |      tokens: 4
      |      overlap: 1
      |    shard:
      |      budget: 16
      |      bucket_width: 64
      |    decontam:
      |      eval_where: "doc_id >= 100"
      |      shingle_len: 3
      |      min_shared: 1
      |""".stripMargin

  private def cu = graft.config.ConfigLoader.fromYaml(yaml)
    .curation.getOrElse(throw new IllegalStateException("no curation section"))

  // doc 100 is the eval row; doc 7 shares a 3-shingle with it
  // (contaminated); doc 8 duplicates doc 2's text (exact-dedup loser);
  // doc 9 is below the 3-token gate.
  private val corpus = Seq(
    ScDoc(1L, "the quick brown fox jumps over fences", "en"),
    ScDoc(2L, "data pipelines shuffle rows across executors", "en"),
    ScDoc(3L, "les pipelines de données sont distribués", "fr"),
    ScDoc(4L, "warum ist verteiltes rechnen so schwer", "de"),
    ScDoc(7L, "benchmark answer key leaked here sadly", "en"),
    ScDoc(8L, "data pipelines shuffle rows across executors", "en"),
    ScDoc(9L, "too short", "en"),
    ScDoc(100L, "benchmark answer key held out", "en"))

  private def batchTruth = {
    val s = spark; import s.implicits._
    StreamCurationSpecHelper.landAndCurate(s, cu, corpus.toDF())
  }

  test("stream output equals the batch chain across micro-batch slicings") {
    val s = spark; import s.implicits._
    val truth = batchTruth
    assert(truth.nonEmpty)
    // 4 micro-batches vs one-shot: slicing-independence with a bounded
    // number of full re-materializations (split=1 adds 8 more chain
    // runs for no extra semantic coverage).
    for (split <- Seq(2, 8)) {
      val ms = MemoryStream[ScDoc](
        org.apache.spark.sql.Encoders.product[ScDoc], spark.sqlContext)
      val landing = Files.createTempDirectory("sc_land").toString
      val out = Files.createTempDirectory("sc_out").toString
      val ckpt = Files.createTempDirectory("sc_ckpt").toString
      val q = StreamCuration.start(s, ms.toDF(), cu, landing, out, ckpt)
      try {
        corpus.grouped(split).foreach(g => { ms.addData(g); q.processAllAvailable() })
        val got = StreamCuration.readOutput(s, out).collect().map(_.toSeq).toSet
        assert(got == truth, s"split=$split")
      } finally q.stop()
    }
  }

  test("contaminated and eval docs are gated; the duplicate loses; short doc gated") {
    val s = spark; import s.implicits._
    val ids = batchTruth.map(_.head.asInstanceOf[Long]).toSet
    assert(!ids.contains(7L))   // contaminated
    assert(!ids.contains(100L)) // eval row is not corpus
    assert(!ids.contains(8L))   // exact-dedup loser (doc 2 is min id)
    assert(!ids.contains(9L))   // below the token gate
    assert(ids.contains(1L) && ids.contains(2L))
  }

  test("restart resumes from the checkpoint and converges to the batch chain") {
    val s = spark; import s.implicits._
    val ms = MemoryStream[ScDoc](
      org.apache.spark.sql.Encoders.product[ScDoc], spark.sqlContext)
    val landing = Files.createTempDirectory("sc_land2").toString
    val out = Files.createTempDirectory("sc_out2").toString
    val ckpt = Files.createTempDirectory("sc_ckpt2").toString
    val q1 = StreamCuration.start(s, ms.toDF(), cu, landing, out, ckpt)
    try { ms.addData(corpus.take(4)); q1.processAllAvailable() } finally q1.stop()
    val q2 = StreamCuration.start(s, ms.toDF(), cu, landing, out, ckpt)
    try {
      ms.addData(corpus.drop(4)); q2.processAllAvailable()
      val got = StreamCuration.readOutput(s, out).collect().map(_.toSeq).toSet
      assert(got == batchTruth)
    } finally q2.stop()
  }

  test("a replayed micro-batch reproduces byte-identical state") {
    val s = spark; import s.implicits._
    val landing = Files.createTempDirectory("sc_land3").toString
    val out = Files.createTempDirectory("sc_out3").toString
    StreamCuration.writeBatch(corpus.take(4).toDF(), 0L, cu, landing, out)
    StreamCuration.writeBatch(corpus.drop(4).toDF(), 1L, cu, landing, out)
    val once = StreamCuration.readOutput(s, out).collect().map(_.toSeq).toSet
    // The at-least-once failure mode: batch 1 delivered again.
    StreamCuration.writeBatch(corpus.drop(4).toDF(), 1L, cu, landing, out)
    val replayed = StreamCuration.readOutput(s, out).collect().map(_.toSeq).toSet
    assert(replayed == once)
    assert(replayed == batchTruth)
  }
}

/** Batch-side truth builder: the SAME landing + curate code path with
  * all rows in one batch — what the stream must converge to.
  */
object StreamCurationSpecHelper {
  def landAndCurate(s: org.apache.spark.sql.SparkSession,
      cu: graft.config.CurationConfig,
      docs: org.apache.spark.sql.DataFrame): Set[Seq[Any]] = {
    val landing = Files.createTempDirectory("sc_truth").toString
    docs.write.mode("overwrite").parquet(landing)
    StreamCuration.curate(s, cu, landing).collect().map(_.toSeq).toSet
  }
}
