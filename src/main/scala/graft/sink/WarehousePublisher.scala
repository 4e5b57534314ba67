package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.config.WarehouseConfig

/** Warehouse publish with atomic staging swap (SURVEY K4-K7; reference
  * redshift_loader/handler.py:76-183).
  *
  * Reference protocol: CREATE staging LIKE target → COPY into staging →
  * verify count → transactional double-RENAME swap → drop old → optional
  * VACUUM/ANALYZE. Invariant to preserve: the load is all-or-nothing and
  * readers never observe partial data.
  *
  * Spark-native equivalent on the session catalog: write the staging
  * TABLE (distkey → repartition, sortkey → sortWithinPartitions — the
  * physical-design mapping from sample_source.yaml:77-80), verify, then
  * swap via catalog renames. A failure before the final rename leaves
  * the old target intact; the staging table is dropped on any abort.
  */
object WarehousePublisher {

  final case class PublishResult(table: String, rowsLoaded: Long, analyzed: Boolean)

  def publish(spark: SparkSession, df: DataFrame, cfg: WarehouseConfig): PublishResult = {
    val target = cfg.qualified
    val staging = s"${target}_staging"
    val old = s"${target}_old"

    // Physical layout: distribution key → hash repartition (co-locates
    // equal keys, the distkey contract); sort keys → within-partition
    // sort (run-length/dictionary-friendly parquet, range-pruned scans).
    val shaped0 = cfg.distkey.fold(df)(k => df.repartition(org.apache.spark.sql.functions.col(k)))
    val shaped = if (cfg.sortkey.nonEmpty)
      shaped0.sortWithinPartitions(cfg.sortkey.map(org.apache.spark.sql.functions.col): _*)
    else shaped0

    spark.sql(s"DROP TABLE IF EXISTS $staging")
    try {
      shaped.write.mode(SaveMode.Overwrite).saveAsTable(staging)
      val loaded = spark.table(staging).count() // K7-style verification read
      // Atomic-visibility swap: single catalog rename is the commit point.
      spark.sql(s"DROP TABLE IF EXISTS $old")
      val targetExists = spark.catalog.tableExists(target)
      if (targetExists) spark.sql(s"ALTER TABLE $target RENAME TO $old")
      try spark.sql(s"ALTER TABLE $staging RENAME TO $target")
      catch {
        case e: Throwable =>
          if (targetExists) spark.sql(s"ALTER TABLE $old RENAME TO $target") // roll back
          throw e
      }
      spark.sql(s"DROP TABLE IF EXISTS $old")
      val analyzed = maintain(spark, cfg, target)
      PublishResult(target, loaded, analyzed)
    } catch {
      case e: Throwable =>
        spark.sql(s"DROP TABLE IF EXISTS $staging")
        throw e
    }
  }

  /** K6: table maintenance — ANALYZE maps to COMPUTE STATISTICS; the
    * VACUUM analog (small-file compaction) is a rewrite, triggered here
    * only under `vacuum_strategy: full` to keep `auto` cheap.
    */
  private def maintain(spark: SparkSession, cfg: WarehouseConfig, table: String): Boolean = {
    if (cfg.vacuumStrategy == "full") {
      val compacted = spark.table(table).coalesce(
        math.max(1, spark.sparkContext.defaultParallelism / 4))
      val tmp = s"${table}_compact"
      compacted.write.mode(SaveMode.Overwrite).saveAsTable(tmp)
      spark.sql(s"DROP TABLE $table")
      spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    }
    if (cfg.analyze) {
      spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS")
      true
    } else false
  }
}
