package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.sources.SourceReader

/** File-landing source (SURVEY S12; README.md:55 `file_processor/`,
  * workflow_definition.json:72-76 "file is already landed").
  *
  * Batch mode is a plain read of the landing prefix. Event-driven
  * behavior (the reference's S3-trigger) maps to Structured Streaming's
  * file source: each newly-landed file becomes a micro-batch —
  * `maxFilesPerTrigger` bounds per-batch work at scale.
  */
object FileSource {

  def read(spark: SparkSession, format: String, landingPath: String): DataFrame =
    SourceReader.read(spark, format, landingPath)

  /** Streaming variant: the file source needs an explicit schema. */
  def readStream(
      spark: SparkSession,
      format: String,
      landingPath: String,
      schema: StructType,
      maxFilesPerTrigger: Int = 100): DataFrame = {
    val r = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
    format.toLowerCase match {
      case "json"    => r.json(landingPath)
      case "csv"     => r.option("header", "true").csv(landingPath)
      case "parquet" => r.parquet(landingPath)
      case other =>
        throw new IllegalArgumentException(s"Unsupported stream format: $other")
    }
  }
}
