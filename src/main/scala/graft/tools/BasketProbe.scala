package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: basket-signature structure of the lineitem fixture — the
  * autopsy input for the copurchase family's signature-collapse
  * geometry (how much does transaction merging buy, and how heavy is
  * the per-signature C(k,2) expansion). Usage:
  * runMain graft.tools.BasketProbe <sfDir>
  */
object BasketProbe {
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
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val baskets = li.groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("l_partkey"))).as("parts"))
      .select(col("parts"), size(col("parts")).as("k"))
      .cache()
    val nBaskets = baskets.count()
    val sigs = baskets.groupBy(col("parts"))
      .agg(count(lit(1)).as("m"), first(col("k")).as("k"))
      .cache()
    val nSigs = sigs.count()
    val pairWork = sigs.select(
      sum(expr("CAST(k AS BIGINT) * (k - 1) DIV 2")).as("sig_pairs")).head.getLong(0)
    val naiveWork = baskets.select(
      sum(expr("CAST(k AS BIGINT) * (k - 1) DIV 2")).as("basket_pairs")).head.getLong(0)
    println(s"BASKETPROBE dir=$sfDir baskets=$nBaskets signatures=$nSigs" +
      s" sig_pair_expansions=$pairWork naive_pair_expansions=$naiveWork")
    println("BASKETPROBE basket-size histogram (k -> baskets):")
    baskets.groupBy(col("k")).count().orderBy(col("k")).collect()
      .foreach(r => println(s"  k=${r.get(0)} n=${r.getLong(1)}"))
    println("BASKETPROBE signature-multiplicity histogram (m -> signatures):")
    sigs.groupBy(col("m")).count().orderBy(col("m")).collect()
      .foreach(r => println(s"  m=${r.getLong(0)} n=${r.getLong(1)}"))
    spark.stop()
  }
}
