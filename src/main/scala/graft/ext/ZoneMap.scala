package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone-map data skipping — the explicit min/max index that
  * Delta/Iceberg tables consult before listing files for a scan.
  *
  * Parquet already prunes ROW GROUPS from footer stats, but at 100 TB
  * the scan's first cost is FILE listing + footer fetches: one footer
  * round-trip per file across tens of thousands of files dominates a
  * selective query. A zone map inverts that: the per-file (min, max)
  * stats live in ONE tiny landed table (a few KB per thousand files),
  * so planning a range scan touches the index, not the data — only
  * files whose zone intersects the predicate are ever opened.
  *
  * Composes with clustered layout ([[ZOrder]] /
  * `repartitionByRange.sortWithinPartitions`): clustering makes zones
  * TIGHT (disjoint ranges → most files skipped); the zone map makes
  * the skipping explicit and plan-time instead of per-footer.
  *
  * The index consultation collects FILE PATHS to the driver — index
  * cardinality is the file count, the same driver-side shape as
  * Spark's own file listing and dynamic partition pruning; row data
  * never leaves the executors.
  */
object ZoneMap {

  /** Land `df` clustered on `clusterCol` into `numFiles`
    * range-partitioned sorted files — the layout that gives each file
    * a tight, near-disjoint [min, max] zone.
    */
  def landClustered(df: DataFrame, path: String, clusterCol: String,
      numFiles: Int): Unit =
    df.repartitionByRange(numFiles, col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode("overwrite").parquet(path)

  /** Build the zone-map index over a landed parquet directory: one row
    * per file with min/max of `statCol` and the row count. One
    * scan-time aggregate keyed by the `_metadata.file_path` hidden
    * column — partial-aggregated map-side, the exchange carries one
    * row per file.
    */
  def buildIndex(spark: SparkSession, dataPath: String, statCol: String): DataFrame =
    spark.read.parquet(dataPath)
      .select(col(statCol), col("_metadata.file_path").as("file_path"))
      .groupBy(col("file_path"))
      .agg(
        min(col(statCol)).as("zmin"),
        max(col(statCol)).as("zmax"),
        count(lit(1)).as("n_rows"))

  /** Files whose zone intersects [lo, hi] — the index is tiny, so the
    * qualifying paths collect to the driver like any file listing.
    */
  def qualifyingFiles(index: DataFrame, lo: Any, hi: Any): Seq[String] =
    index.filter(!(col("zmax") < lit(lo) || col("zmin") > lit(hi)))
      .select(col("file_path")).collect().map(_.getString(0)).toSeq

  /** Range scan through the zone map: open only intersecting files,
    * then apply the exact residual predicate (zones are necessary, not
    * sufficient). Returns (scan, filesRead, filesTotal) so callers —
    * and specs — can assert the skipping actually bit.
    */
  def prunedRangeScan(spark: SparkSession, dataPath: String, index: DataFrame,
      statCol: String, lo: Any, hi: Any): (DataFrame, Int, Long) = {
    val files = qualifyingFiles(index, lo, hi)
    val total = index.count()
    val scan =
      if (files.isEmpty) spark.read.parquet(dataPath).limit(0)
      else spark.read.parquet(files: _*)
    (scan.filter(col(statCol).between(lit(lo), lit(hi))), files.size, total)
  }
}
