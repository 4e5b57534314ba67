package graft.sink

import org.apache.spark.sql.DataFrame

/** Storage-bucketed table layout: the persisted analog of the
  * publisher's distkey (`WarehousePublisher` repartitions in-flight;
  * this writes the hash layout INTO storage plus catalog metadata, the
  * Spark equivalent of the reference's Redshift DISTKEY/SORTKEY DDL,
  * `redshift_loader/handler.py` + `sample_source.yaml` target layout).
  *
  * Why it matters at 100 TB: a fact-fact join between two tables
  * bucketed on the join key with the same bucket count satisfies the
  * join's required HashPartitioning straight off the scan — NO shuffle
  * of either side, per join, forever after the one-time write. Same for
  * aggregation on the bucket key. The shuffle is paid once at layout
  * time instead of on every downstream query, which is the right trade
  * for tables that are written once and joined daily.
  */
object BucketedLayout {

  /** Write `df` as a parquet table bucketed (and bucket-sorted) on
    * `bucketCol`, data at `path`, metadata in the session catalog.
    * Bucket-local sort keeps merge-join sides pre-sorted when bucket
    * files are coalesced; numBuckets must match across tables meant to
    * co-join.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
      numBuckets: Int, bucketCol: String): Unit =
    df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
}
