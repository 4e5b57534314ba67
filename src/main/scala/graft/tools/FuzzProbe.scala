package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: decompose fuzzy_match cost at a given fixture dir —
  * candidate generation vs levenshtein verify vs output — so tuning
  * targets the real term (PLANS_r10 fuzzy-block investigation).
  */
object FuzzProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val cust = graft.Tables.t(spark, dir, "customer")
    val keyed = cust.select(col("c_custkey").as("id"), col("c_name").as("name"),
      substring(col("c_name"), 1, 16).as("blk"))
    for (_ <- 1 to 2) {
      time("candidates only") {
        keyed.alias("a").join(keyed.alias("b"),
            col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
          .count()
      }
      time("candidates + levenshtein") {
        keyed.alias("a").join(keyed.alias("b"),
            col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
          .select(levenshtein(col("a.name"), col("b.name")).as("dist"))
          .filter(col("dist") <= 1).count()
      }
      time("full blockedPairs") {
        graft.ext.FuzzyJoin.blockedPairs(cust, "c_custkey", "c_name",
          substring(col("c_name"), 1, 16), maxDist = 1).count()
      }
    }
    spark.stop()
  }
}
