package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.ingest.FileSource

/** Stream-source dispatch (SURVEY S12/S13; reference README.md:11
  * Kinesis/Kafka, README.md:55-56 `file_processor`/`stream_processor`,
  * workflow_definition.json:72-81).
  *
  * Two shapes:
  *  - file landing prefix (the reference's S3-event trigger): each newly
  *    landed file becomes a micro-batch, `maxFilesPerTrigger` bounds
  *    per-batch work;
  *  - Kafka-shaped broker stream: value bytes parsed as JSON against the
  *    declared schema. The Kafka connector jar is a deploy-time
  *    dependency (not bundled here); the plan construction is identical.
  *
  * After `read`, callers tag event time (`withWatermark`) and reuse the
  * exact batch operators in [[EventWindows]].
  */
object StreamSource {

  /** File-source stream over a landing prefix. */
  def readFiles(
      spark: SparkSession,
      format: String,
      landingPath: String,
      schema: StructType,
      maxFilesPerTrigger: Int = 100): DataFrame =
    FileSource.readStream(spark, format, landingPath, schema, maxFilesPerTrigger)

  /** Kafka-shaped stream: subscribe to a topic, parse JSON values into
    * the declared schema. Requires the spark-sql-kafka connector on the
    * cluster classpath (standard deploy; not part of this repo's
    * offline test environment — covered by plan-construction semantics
    * only, all stateful logic is tested via MemoryStream/file sources).
    */
  def readKafka(
      spark: SparkSession,
      bootstrapServers: String,
      topic: String,
      schema: StructType,
      startingOffsets: String = "latest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .select(from_json(col("value").cast("string"), schema).as("payload"))
      .select(col("payload.*"))

  /** Kinesis-shaped stream (reference README.md:11 names Kinesis as the
    * stream transport): subscribe to a stream, parse the record `data`
    * bytes as JSON into the declared schema — the exact analog of
    * [[readKafka]]'s value parse. Like Kafka, the connector
    * (spark-sql-kinesis, a structured-streaming source registered under
    * format "kinesis" with a `data` binary column) is a deploy-time
    * dependency; this repo covers plan construction + config routing,
    * and all stateful logic downstream is transport-agnostic
    * (MemoryStream/file-source tested).
    */
  def readKinesis(
      spark: SparkSession,
      streamName: String,
      region: String,
      schema: StructType,
      startingPosition: String = "latest"): DataFrame =
    spark.readStream
      .format("kinesis")
      .option("streamName", streamName)
      .option("region", region)
      .option("startingPosition", startingPosition)
      .load()
      .select(from_json(col("data").cast("string"), schema).as("payload"))
      .select(col("payload.*"))
}
