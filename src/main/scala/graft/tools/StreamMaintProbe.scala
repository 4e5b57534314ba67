package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ext.{IvfIndex, SimSearch}
import graft.stream.StreamIvfUpsert

/** Scale probe for the MAINTAINED streaming IVF loop (VERDICT r15 #4):
  * `startMaintained`'s per-batch cost — land + upsert + tick — had
  * only fixture-scale evidence. Plant a seed index over the first 80%
  * of a grown corpus, stream the rest through the real
  * `startMaintained` in fixed-size micro-batches under a NEVER-BREACH
  * policy, and table per-batch wall time; then time the converged
  * no-op tick alone. Expectation: per-batch cost follows the BATCH
  * size across corpus decades, the tick stays flat.
  *
  * Usage: runMain graft.tools.StreamMaintProbe <sfDir> [batches] [batchSize]
  */
object StreamMaintProbe {
  case class PV(vec_id: Long, embedding: Seq[Float])

  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val nBatches = if (args.length > 1) args(1).toInt else 4
    val batchSize = if (args.length > 2) args(2).toInt else 10000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val n = emb.count()
    val streamed = (nBatches.toLong * batchSize).min(n / 5)
    val seedCut = n - streamed
    println(s"[probe] corpus n=$n seed=$seedCut streaming $streamed rows " +
      s"in $nBatches batches of $batchSize")

    val corpusDir = Files.createTempDirectory("smp_corpus").toString
    val deltaDir = Files.createTempDirectory("smp_delta").toString
    val indexDir = Files.createTempDirectory("smp_index").toString
    val ckpt = Files.createTempDirectory("smp_ckpt").toString

    // Seed publish through the scale path: sampled training at the
    // corpus-derived stride, cells over the seed, watermark at its max.
    val seed = emb.filter(col("vec_id") < seedCut)
    val k = SimSearch.IvfParams.forCorpus(seedCut).numCentroids
    val stride = SimSearch.IvfParams.trainStrideFor(seedCut, k)
    var t0 = System.nanoTime()
    val cents = SimSearch.trainCentroidsLockedSampled(seed, k, 2, stride)
      .localCheckpoint()
    IvfIndex.publishIndex(cents, IvfIndex.assignCells(seed, cents),
      indexDir, 0L, trainedWatermark = Some(seedCut - 1))
    seed.withColumn("batch_id", lit(-1L))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(corpusDir)
    println(f"[probe] seed publish (K=$k stride=$stride): " +
      f"${(System.nanoTime() - t0) / 1e9}%.2f s")

    val policy = IvfIndex.RetrainPolicy(maxDeltaPct = 100,
      maxCellRatio = 1000000) // never breach: steady-state economics
    val batches: Seq[Seq[PV]] = emb.filter(col("vec_id") >= seedCut)
      .orderBy("vec_id").limit(streamed.toInt).collect()
      .map(r => PV(r.getLong(0), r.getSeq[Float](1))).toSeq
      .grouped(batchSize).toSeq.take(nBatches)

    val ms = MemoryStream[PV](
      org.apache.spark.sql.Encoders.product[PV], spark.sqlContext)
    val q = StreamIvfUpsert.startMaintained(spark, ms.toDF(), corpusDir,
      deltaDir, indexDir, iters = 2, policy, ckpt)
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        t0 = System.nanoTime()
        ms.addData(b)
        q.processAllAvailable()
        println(f"[probe] batch $i (${b.size} rows): " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    } finally q.stop()

    // The tick alone, converged (fold-forward count, no breach).
    for (r <- 1 to 3) {
      t0 = System.nanoTime()
      StreamIvfUpsert.maintainTick(spark, corpusDir, deltaDir, indexDir, 2,
        policy, knownCorpusRows = Some(n))
      println(f"[probe] no-op tick rep $r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
