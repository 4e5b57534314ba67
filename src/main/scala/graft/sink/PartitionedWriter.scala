package graft.sink

import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Columnar zone writers (SURVEY K1-K3).
  *
  * K1/K2 — processed-zone write (transform_data.py:215-229): configured
  * format (default parquet), optional Hive-style partitioning, overwrite.
  * The year=/month=/day= layout is what enables partition pruning at
  * read time (README.md:153) — Catalyst's PruneFileSourcePartitions
  * skips non-matching directories entirely, the property that keeps a
  * 100 TB table scannable.
  *
  * K3 — raw-zone landing (api_ingestion/handler.py:277-313): the
  * reference lands each page at a time-partitioned key
  * `prefix/yyyy/MM/dd/HH/.../uuid.json`; here the ingest date becomes
  * Hive partition columns + a uuid per row-group file, preserving the
  * layout contract (time-pruned raw scans) in Spark's native layout.
  */
object PartitionedWriter {

  def write(
      df: DataFrame,
      path: String,
      format: String = "parquet",
      partitionBy: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.format(format).mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).save(path)
  }

  def landRaw(
      df: DataFrame,
      path: String,
      ingestTime: LocalDateTime,
      format: String = "json"): Unit = {
    val stamped = df
      .withColumn("ingest_year", lit(ingestTime.getYear))
      .withColumn("ingest_month", lit(ingestTime.getMonthValue))
      .withColumn("ingest_day", lit(ingestTime.getDayOfMonth))
      .withColumn("ingest_hour", lit(ingestTime.getHour))
    stamped.write.format(format)
      .partitionBy("ingest_year", "ingest_month", "ingest_day", "ingest_hour")
      .mode(SaveMode.Append)
      .save(path)
  }
}
