package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loader. All engine queries read the driver-generated
  * parquet tables (TESTDATA.md) through this single entry point so the
  * scan path (predicate pushdown, column pruning) is uniform.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    // reader rejects; read nanos as long and truncate to micros (same
    // semantics as DuckDB's TIMESTAMP_NS → TIMESTAMP cast).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        (org.apache.spark.sql.functions.col("ts") / 1000L).cast("long")))
    else df
  }
}
