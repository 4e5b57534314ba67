package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: time the prefix-filtered Jaccard join end-to-end.
  * Usage: runMain graft.tools.JaccProbe <sfDir> [threshold]
  */
object JaccProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val th = args.lift(1).map(_.toDouble).getOrElse(0.6)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count() // warm
    for (run <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.ext.SetSimJoin.jaccardPairs(docs, "doc_id", "text", th).count()
      println(f"run$run ${(System.nanoTime() - t0) / 1e9}%6.2f s  pairs=$n")
    }
    spark.stop()
  }
}
