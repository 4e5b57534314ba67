package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: what does ONE `spark.read.parquet` resolution cost, vs
  * reusing the resolved DataFrame? The 252-query bench calls
  * `Tables.t` ~2-3 times per query × 3 reps — if resolution is
  * milliseconds the floor is elsewhere; if it is tens of milliseconds
  * it is a double-digit share of the sub-second rows.
  * Usage: runMain graft.tools.ResolveProbe <sfDir>
  */
object ResolveProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
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
    spark.sparkContext.setLogLevel("ERROR")
    def bench(label: String)(body: => Unit): Unit = {
      body // warm once
      val t0 = System.nanoTime()
      (1 to 50).foreach(_ => body)
      println(f"RESOLVE $label%-28s ${(System.nanoTime() - t0) / 1e6 / 50}%8.2f ms/call")
    }
    val tables = Seq("lineitem", "orders", "documents", "embeddings")
    bench("read.parquet (resolve only)") {
      tables.foreach(n => spark.read.parquet(s"$sfDir/$n.parquet"))
    }
    bench("resolve + count job") {
      spark.read.parquet(s"$sfDir/region.parquet").count()
    }
    val cached = spark.read.parquet(s"$sfDir/region.parquet")
    bench("cached relation count job") {
      cached.count()
    }
    spark.stop()
  }
}
