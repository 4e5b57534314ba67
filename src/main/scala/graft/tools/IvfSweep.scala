package graft.tools
import org.apache.spark.sql.SparkSession
/** Scratch sweep: IVF top-1 agreement vs brute force across probe counts.
  * Usage: runMain graft.tools.IvfSweep [sfDir] [centroids]
  */
object IvfSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val centroids = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.t(spark, sfDir, "embeddings")
    val brute = graft.ext.SimSearch.bruteTopK(emb, 100).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (probes <- Seq(1, 2, 3, 4, 6, 8, 10, 12).filter(_ <= centroids)) {
      val p = graft.ext.SimSearch.IvfParams(centroids, probes)
      for (trained <- Seq(false, true)) {
        val t0 = System.nanoTime()
        val q = if (trained) graft.ext.SimSearch.ivfTopKTrained(emb, 100, p)
                else graft.ext.SimSearch.ivfTopK(emb, 100, p)
        val ivf = q.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val ms = (System.nanoTime() - t0) / 1e6
        val agree = brute.count { case (qq, c) => ivf.get(qq).contains(c) }
        val tag = if (trained) "trained" else "firstK "
        println(f"SWEEP $tag centroids=$centroids probes=$probes agree=$agree/100 time=$ms%.0fms")
      }
    }
    spark.stop()
  }
}
