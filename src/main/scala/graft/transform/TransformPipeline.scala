package graft.transform

import java.time.LocalDateTime

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.config.SchemaConfig

/** Required-field filter (SURVEY F1; transform_data.py:92-103): the
  * iterated per-field filters form a conjunction — compiled here as a
  * single AND predicate so Catalyst pushes one combined filter to the
  * scan.
  */
object NullFilter {
  def compile(required: Seq[String]): DataFrame => DataFrame =
    df =>
      if (required.isEmpty) df
      else df.filter(required.map(col(_).isNotNull).reduce(_ && _))
}

/** Lineage metadata columns (SURVEY P4; transform_data.py:105-111).
  *
  * `processed_timestamp` is pinned to the pipeline start time instead of
  * `current_timestamp()` so the value is identical across executors,
  * retries, and re-runs of the same execution — at 1000-executor scale
  * per-task clocks differ (the reference's per-run now() is evaluated
  * driver-side; we keep that determinism explicit).
  */
object Metadata {
  def compile(sourceName: String, startTime: LocalDateTime): DataFrame => DataFrame =
    df =>
      df.withColumn("source_name", lit(sourceName))
        .withColumn("processed_timestamp", to_timestamp(lit(
          java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss").format(startTime))))
}

/** Partition-column derivation (SURVEY P5; transform_data.py:113-150).
  *
  * For each requested partition in {year, month, day} not already
  * present: extract from the FIRST column whose name contains "date"
  * (case-insensitive) — the reference's heuristic — else fall back to a
  * constant from the pinned start time (the reference uses
  * datetime.now(); we pin to PipelineContext.startTime so the fallback
  * is deterministic).
  */
object Partitioner {
  def compile(partitions: Seq[String], startTime: LocalDateTime): DataFrame => DataFrame = {
    df =>
      partitions.foldLeft(df) { (acc, p) =>
        if (acc.columns.contains(p)) acc
        else {
          val dateCol = acc.columns.find(_.toLowerCase.contains("date"))
          p match {
            case "year" => acc.withColumn("year",
              dateCol.map(c => year(col(c))).getOrElse(lit(startTime.getYear)))
            case "month" => acc.withColumn("month",
              dateCol.map(c => month(col(c))).getOrElse(lit(startTime.getMonthValue)))
            case "day" => acc.withColumn("day",
              dateCol.map(c => dayofmonth(col(c))).getOrElse(lit(startTime.getDayOfMonth)))
            case _ => acc // non-date partition columns must already exist
          }
        }
      }
  }
}

/** The full config → DataFrame compiler: mapping → transformations →
  * required-filter → metadata → partition derivation, exactly the
  * reference's stage order (transform_data.py:206-212). Purely
  * declarative composition — nothing executes until the caller's
  * action, so Catalyst optimizes across all five stages (e.g. the
  * required-field IsNotNull filters push below the projections into the
  * scan).
  */
object TransformPipeline {
  def compile(
      schema: SchemaConfig,
      sourceName: String,
      startTime: LocalDateTime,
      partitionBy: Seq[String] = Nil): DataFrame => DataFrame =
    MappingCompiler.compile(schema.mapping)
      .andThen(Transforms.compile(schema.transformations))
      .andThen(NullFilter.compile(schema.required))
      .andThen(Metadata.compile(sourceName, startTime))
      .andThen(Partitioner.compile(partitionBy, startTime))
}
