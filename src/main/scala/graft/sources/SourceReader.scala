package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Format-dispatching reader (SURVEY S1-S4; transform_data.py:186-193).
  *
  * Contract preserved:
  *  - JSON: schema inferred (spark.read.json);
  *  - CSV: header=true, NO inferSchema — every column lands as string,
  *    casts are explicit config transformations, never reader magic;
  *  - Parquet: native scan (pushdown + pruning built in);
  *  - unknown format → error (the reference raises ValueError).
  */
object SourceReader {
  def read(spark: SparkSession, format: String, path: String): DataFrame =
    format.toLowerCase match {
      case "json"    => spark.read.json(path)
      case "csv"     => spark.read.option("header", "true").csv(path)
      case "parquet" => spark.read.parquet(path)
      case other =>
        throw new IllegalArgumentException(s"Unsupported data format: $other")
    }
}
