package graft.stream

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ext.{IvfIndex, SimSearch}

case class SivVec(vec_id: Long, embedding: Seq[Float])

/** Streaming IVF upsert: the accumulated index equals a one-shot
  * assignment for any micro-batch slicing; replay is idempotent;
  * serving over the streamed index equals batch serving.
  */
class StreamIvfUpsertSpec extends SparkTestBase {

  private lazy val all: Seq[SivVec] = {
    val s = spark
    s.read.parquet(s"$sf0001/embeddings.parquet")
      .filter(col("vec_id") < 48)
      .select("vec_id", "embedding")
      .collect()
      .map(r => SivVec(r.getLong(0), r.getSeq[Float](1)))
      .toSeq
  }

  private lazy val cents = {
    val s = spark
    SimSearch.trainCentroidsLocked(
      s.read.parquet(s"$sf0001/embeddings.parquet"), 16, 2).localCheckpoint()
  }

  private def oneShot = {
    val s = spark; import s.implicits._
    IvfIndex.assignCells(all.toDF(), cents).collect().map(_.toSeq).toSet
  }

  private def runStream(split: Int): String = {
    val s = spark
    val ms = MemoryStream[SivVec](
      org.apache.spark.sql.Encoders.product[SivVec], s.sqlContext)
    val out = Files.createTempDirectory("siv_out").toString
    val ckpt = Files.createTempDirectory("siv_ckpt").toString
    val q = StreamIvfUpsert.start(s, ms.toDF(), cents, out, ckpt)
    try all.grouped(split).foreach(g => { ms.addData(g); q.processAllAvailable() })
    finally q.stop()
    out
  }

  test("serving may start before the first micro-batch commits:" +
    " empty/missing output dir reads as an empty index") {
    // Missing dir entirely.
    val missing = Files.createTempDirectory("siv_empty").toString + "/never_written"
    val idx0 = StreamIvfUpsert.readIndex(spark, missing)
    assert(idx0.columns.toSeq === Seq("vec_id", "cell"))
    assert(idx0.count() === 0L)
    // Dir exists (e.g. created by the sink) but no batch_id= partition
    // has committed yet.
    val bare = Files.createTempDirectory("siv_bare").toString
    val idx1 = StreamIvfUpsert.readIndex(spark, bare)
    assert(idx1.count() === 0L)
  }

  test("accumulated index equals the one-shot assignment, any slicing") {
    val truth = oneShot
    for (split <- Seq(7, 16, 48)) {
      val out = runStream(split)
      val got = StreamIvfUpsert.readIndex(spark, out)
        .collect().map(_.toSeq).toSet
      assert(got === truth, s"split=$split")
    }
  }

  test("replaying a micro-batch is idempotent and leaves other batches alone") {
    val s = spark; import s.implicits._
    val out = Files.createTempDirectory("siv_replay").toString
    val (b0, b1) = all.splitAt(24)
    StreamIvfUpsert.writeBatch(b0.toDF(), 0L, cents, out)
    StreamIvfUpsert.writeBatch(b1.toDF(), 1L, cents, out)
    val before = StreamIvfUpsert.readIndex(s, out).collect().map(_.toSeq).toSet
    StreamIvfUpsert.writeBatch(b1.toDF(), 1L, cents, out) // crash-window replay
    val after = StreamIvfUpsert.readIndex(s, out).collect().map(_.toSeq).toSet
    assert(after === before)
    assert(after.size === all.size)
  }

  test("maintained stream closes the loop end-to-end: micro-batches" +
    " accumulate deltas, the policy breaches mid-stream, the retrain" +
    " publishes atomically, and the loop converges") {
    val s = spark; import s.implicits._
    val emb = s.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding")
    val n = emb.count() // 500, dense ids (AnnEvalSpec pins density)
    val seedCut = 300L
    val corpusDir = Files.createTempDirectory("sivm_corpus").toString
    val deltaDir = Files.createTempDirectory("sivm_delta").toString
    val indexDir = Files.createTempDirectory("sivm_index").toString
    val ckpt = Files.createTempDirectory("sivm_ckpt").toString

    // Seed: v=0 trained on the initial corpus through the batch path,
    // watermarked at its max id; the raw seed vectors land in the
    // corpus store like any batch (a pre-stream backfill partition).
    val seed = emb.filter(col("vec_id") < seedCut)
    val seedCents = SimSearch.trainCentroidsLocked(seed, 16, 2).localCheckpoint()
    IvfIndex.publishIndex(seedCents, IvfIndex.assignCells(seed, seedCents),
      indexDir, 0L, trainedWatermark = Some(seedCut - 1))
    seed.withColumn("batch_id", lit(-1L))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(corpusDir)

    // Any fresh delta breaches (max_delta_pct = 1): every micro-batch
    // that lands new vectors must trigger exactly one retrain.
    val policy = IvfIndex.RetrainPolicy(maxDeltaPct = 1, maxCellRatio = 1000000)
    val vecs = emb.collect()
      .map(r => SivVec(r.getLong(0), r.getSeq[Float](1)))
      .filter(_.vec_id >= seedCut)
    val (batchA, batchB) = vecs.partition(_.vec_id < 400L)

    val ms = MemoryStream[SivVec](
      org.apache.spark.sql.Encoders.product[SivVec], s.sqlContext)
    val q = StreamIvfUpsert.startMaintained(s, ms.toDF(), corpusDir, deltaDir,
      indexDir, iters = 2, policy, ckpt)
    try {
      // Batch A: 100 new vectors → breach → v=1, watermark rebased to
      // the corpus max SO FAR. The flip happens mid-stream.
      ms.addData(batchA.toSeq); q.processAllAvailable()
      assert(IvfIndex.currentIndexVersion(s, indexDir) === Some(1L))
      assert(IvfIndex.trainedWatermarkOf(s, indexDir) === Some(399L))
      // Batch B: next 100 → second breach → v=2, watermark = corpus max.
      ms.addData(batchB.toSeq); q.processAllAvailable()
      assert(IvfIndex.currentIndexVersion(s, indexDir) === Some(2L))
      assert(IvfIndex.trainedWatermarkOf(s, indexDir) === Some(n - 1))
    } finally q.stop()

    // The final published index IS the from-scratch build over
    // everything that arrived (K corpus-derived per tick; at this scale
    // the derived stride is 1, where sampled ≡ full training).
    val k = SimSearch.IvfParams.forCorpus(n).numCentroids
    val freshCents = SimSearch.trainCentroidsLocked(emb, k, 2).localCheckpoint()
    val (_, gotCells) = IvfIndex.readCurrentIndex(s, indexDir)
    assert(gotCells.collect().map(_.toSeq).toSet ===
      IvfIndex.assignCells(emb, freshCents).collect().map(_.toSeq).toSet)
    // Serving state: everything is covered by the published version
    // (no post-watermark deltas), and the composed serving cells agree.
    val served = StreamIvfUpsert.servingCells(s, indexDir, deltaDir)
    assert(served.collect().map(_.toSeq).toSet ===
      gotCells.collect().map(_.toSeq).toSet)
    // Convergence: one more tick with the SAME policy no-ops — the
    // rebased watermark sees an empty delta.
    assert(!StreamIvfUpsert.maintainTick(s, corpusDir, deltaDir, indexDir,
      2, policy))
    assert(IvfIndex.currentIndexVersion(s, indexDir) === Some(2L))
  }

  test("fold-forward corpus count: the marker tracks the real count across" +
    " appends, replays, gaps, and a missing-marker bootstrap") {
    val s = spark; import s.implicits._
    val corpusDir = Files.createTempDirectory("sivf_cnt").toString
    val conf = s.sparkContext.hadoopConfiguration
    def land(batchId: Long, ids: Seq[Long]): Unit =
      ids.map(i => SivVec(i, Seq(1f, 0f))).toDF()
        .withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(corpusDir)
    def realCount: Long = s.read.parquet(corpusDir).count()

    // Bootstrap over a seed partition the marker never saw.
    land(-1L, 0L until 10L)
    land(0L, 10L until 14L)
    assert(StreamIvfUpsert.foldForwardCorpusRows(s, corpusDir, 0L, 4L) === 14L)
    // Steady-state append: no recount, still exact.
    land(1L, 14L until 20L)
    assert(StreamIvfUpsert.foldForwardCorpusRows(s, corpusDir, 1L, 6L) === 20L)
    // Replay of the last batch with a DIFFERENT row set (the failed
    // attempt's partition is overwritten idempotently).
    land(1L, 14L until 17L)
    assert(StreamIvfUpsert.foldForwardCorpusRows(s, corpusDir, 1L, 3L) === 17L)
    assert(realCount === 17L)
    // Batch-id gap (out-of-band landing): falls back to one recount.
    land(5L, 100L until 108L)
    assert(StreamIvfUpsert.foldForwardCorpusRows(s, corpusDir, 5L, 8L) === 25L)
    assert(realCount === 25L)
  }

  test("no-breach maintained tick with the fold-forward count runs strictly" +
    " fewer jobs than a counting tick (the corpus count job is gone)") {
    val s = spark; import s.implicits._
    val corpusDir = Files.createTempDirectory("sivt_corpus").toString
    val deltaDir = Files.createTempDirectory("sivt_delta").toString
    val indexDir = Files.createTempDirectory("sivt_index").toString
    val emb = s.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding")
    val n = emb.count()
    val cents16 = SimSearch.trainCentroidsLocked(emb, 16, 2).localCheckpoint()
    IvfIndex.publishIndex(cents16, IvfIndex.assignCells(emb, cents16),
      indexDir, 0L, trainedWatermark = Some(n - 1))
    emb.withColumn("batch_id", lit(-1L))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(corpusDir)
    val neverBreach = IvfIndex.RetrainPolicy(
      maxDeltaPct = 100, maxCellRatio = 1000000)
    def jobsDuring(f: => Unit): Int = {
      val counter = new java.util.concurrent.atomic.AtomicInteger(0)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          counter.incrementAndGet()
      }
      s.sparkContext.addSparkListener(l)
      try { f; Thread.sleep(300) } finally s.sparkContext.removeSparkListener(l)
      counter.get()
    }
    // Warm both paths once (JIT/codegen jobs would skew the first read).
    StreamIvfUpsert.maintainTick(s, corpusDir, deltaDir, indexDir, 2, neverBreach)
    val withCount = jobsDuring {
      assert(!StreamIvfUpsert.maintainTick(
        s, corpusDir, deltaDir, indexDir, 2, neverBreach))
    }
    val withKnown = jobsDuring {
      assert(!StreamIvfUpsert.maintainTick(
        s, corpusDir, deltaDir, indexDir, 2, neverBreach,
        knownCorpusRows = Some(n)))
    }
    assert(withKnown < withCount,
      s"fold-forward tick ran $withKnown jobs vs counting tick's $withCount" +
        " — the corpus count job did not disappear")
  }

  test("a genuinely NEW micro-batch below the trained-at watermark fails" +
    " fast (non-monotone vec_ids would silently vanish from serving)") {
    val s = spark; import s.implicits._
    val emb = s.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding")
    val corpusDir = Files.createTempDirectory("sivw_corpus").toString
    val deltaDir = Files.createTempDirectory("sivw_delta").toString
    val indexDir = Files.createTempDirectory("sivw_index").toString
    val ckpt = Files.createTempDirectory("sivw_ckpt").toString
    val seed = emb.filter(col("vec_id") < 300L)
    val seedCents = SimSearch.trainCentroidsLocked(seed, 16, 2).localCheckpoint()
    IvfIndex.publishIndex(seedCents, IvfIndex.assignCells(seed, seedCents),
      indexDir, 0L, trainedWatermark = Some(299L))
    seed.withColumn("batch_id", lit(-1L))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(corpusDir)
    val policy = IvfIndex.RetrainPolicy(maxDeltaPct = 100, maxCellRatio = 1000000)
    val ms = MemoryStream[SivVec](
      org.apache.spark.sql.Encoders.product[SivVec], s.sqlContext)
    val q = StreamIvfUpsert.startMaintained(s, ms.toDF(), corpusDir, deltaDir,
      indexDir, iters = 2, policy, ckpt)
    try {
      // vec_id 100 <= watermark 299 and batch 0 never landed: fail fast.
      ms.addData(SivVec(100L, Seq(1f, 0f, 0f, 0f)))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def chain(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(e => Option(e.getMessage).getOrElse("")).toSeq
      assert(chain(ex).exists(_.contains("monotone vec_ids")),
        s"wrong failure: ${chain(ex).mkString(" | ")}")
    } finally q.stop()
  }

  test("serving over the streamed index equals batch serving") {
    val s = spark; import s.implicits._
    val out = runStream(16)
    val emb = all.toDF().withColumnRenamed("embedding", "embedding")
    val served = IvfIndex.topKOverCells(emb,
      StreamIvfUpsert.readIndex(s, out), cents, 8, 3, 4)
      .collect().map(_.toSeq).toSet
    val batch = IvfIndex.topKOverCells(emb,
      IvfIndex.assignCells(emb, cents), cents, 8, 3, 4)
      .collect().map(_.toSeq).toSet
    assert(served === batch)
    assert(served.nonEmpty)
  }
}
