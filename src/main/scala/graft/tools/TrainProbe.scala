package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: index BUILD cost — full locked training vs the sampled
  * variant at the same corpus-derived geometry. Evidence table for the
  * sampled-training scale claim (train on the residue slice, serve the
  * corpus). Usage: runMain graft.tools.TrainProbe <sfDir> [strides...]
  *
  * `TrainProbe <sfDir> act` instead measures the closed loop's retrain
  * ACT end-to-end: seed a watermarked base-trained index, breach the
  * delta policy, and time `maintainIndexAuto` — the stride now derives
  * from the corpus inside the act, so this row is the proof the loop
  * rides the stride curve (decide + sampled train + one assignment
  * pass + publish), not the full build's ~N^1.5.
  */
object TrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    if (args.tail.headOption.contains("act")) { actProbe(sfDir); return }
    val strides = if (args.tail.nonEmpty) args.tail.map(_.toInt) else Array(1, 4, 16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val p = graft.ext.SimSearch.IvfParams.forCorpus(n)
    println(s"TRAINPROBE corpus=$n K=${p.numCentroids}")
    strides.foreach { e =>
      val t0 = System.nanoTime()
      val cents =
        if (e == 1) graft.ext.SimSearch.trainCentroidsLocked(emb, p.numCentroids, 2)
        else graft.ext.SimSearch.trainCentroidsLockedSampled(emb, p.numCentroids, 2, e)
      val k = cents.count()
      println(f"TRAINPROBE stride=$e%-3d ${(System.nanoTime() - t0) / 1e9}%8.2f s  cents=$k")
    }
    spark.stop()
  }

  private def actProbe(sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").localCheckpoint()
    val n = emb.count()
    val k = graft.ext.SimSearch.IvfParams.forCorpus(n).numCentroids
    val stride = graft.ext.SimSearch.IvfParams.trainStrideFor(n, k)
    val cutoff = 4L * n / 5
    val dir = java.nio.file.Files.createTempDirectory("actprobe").toString
    // Seed: base-trained, delta-upserted drifted index (not timed).
    val baseCents = graft.ext.SimSearch.trainCentroidsLockedSampled(
      emb.filter(col("vec_id") < cutoff), k, 2,
      graft.ext.SimSearch.IvfParams.trainStrideFor(cutoff, k)).localCheckpoint()
    graft.ext.IvfIndex.publishIndex(baseCents,
      graft.ext.IvfIndex.assignCells(emb, baseCents), dir, 0L,
      trainedWatermark = Some(cutoff - 1))
    println(s"ACTPROBE corpus=$n K=$k derived_stride=$stride (seeded)")
    // The timed ACT: decide (breach) + sampled retrain + one assignment
    // pass + atomic versioned publish.
    val policy = graft.ext.IvfIndex.RetrainPolicy(maxDeltaPct = 1,
      maxCellRatio = 1000000)
    val t0 = System.nanoTime()
    val fired = graft.ext.IvfIndex.maintainIndexAuto(emb, k, 2, dir, policy)
    println(f"ACTPROBE retrain_act ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
      s"  fired=$fired v=${graft.ext.IvfIndex.currentIndexVersion(spark, dir)}")
    // Converged follow-up tick (the no-op cost — K-row work).
    val t1 = System.nanoTime()
    val fired2 = graft.ext.IvfIndex.maintainIndexAuto(emb, k, 2, dir, policy)
    println(f"ACTPROBE noop_tick   ${(System.nanoTime() - t1) / 1e9}%8.2f s" +
      s"  fired=$fired2")
    spark.stop()
  }
}
