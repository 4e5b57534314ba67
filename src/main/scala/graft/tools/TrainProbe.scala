package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: index BUILD cost — full locked training vs the sampled
  * variant at the same corpus-derived geometry. Evidence table for the
  * sampled-training scale claim (train on the residue slice, serve the
  * corpus). Usage: runMain graft.tools.TrainProbe <sfDir> [strides...]
  */
object TrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
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
}
