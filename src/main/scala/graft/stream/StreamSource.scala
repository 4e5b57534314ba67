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

  /** The transport-agnostic half of both broker sources: binary
    * payload bytes → UTF-8 → JSON against the declared schema →
    * flattened columns. Kafka exposes the bytes as `value`, Kinesis as
    * `data`; everything after the column name is THIS function, so it
    * is contract-tested connector-free over MemoryStream binary
    * payloads (`StreamPayloadParseSpec`) — the executed in-sandbox
    * twin of the jar-gated connector path. Malformed payloads parse to
    * a null struct and surface as all-null rows (PERMISSIVE), so a
    * poison message can never kill the stream.
    */
  def parseJsonPayload(raw: DataFrame, byteCol: String, schema: StructType): DataFrame =
    raw
      .select(from_json(col(byteCol).cast("string"), schema).as("payload"))
      .select(col("payload.*"))

  /** The executed broker path: subscribe to a [[BrokerLog]] directory
    * topic via the custom DataSource V2 [[BrokerLogMicroBatchStream]]
    * and parse record values exactly like Kafka's — same schema shape
    * (partition/offset/ts/value), same [[parseJsonPayload]], same
    * downstream operators. This is the in-sandbox proof of the
    * engine-side streaming contract (offset tracking, micro-batch
    * planning, checkpointed restart); [[readKafka]]/[[readKinesis]]
    * swap only the transport line.
    */
  def readBroker(
      spark: SparkSession,
      brokerDir: String,
      schema: StructType): DataFrame =
    parseJsonPayload(
      spark.readStream
        .format("graft-broker")
        .option("path", brokerDir)
        .load(),
      "value", schema)

  /** Kafka-shaped stream: subscribe to a topic, parse JSON values into
    * the declared schema. Requires the spark-sql-kafka connector on the
    * cluster classpath (standard deploy; not part of this repo's
    * offline test environment — plan construction covered by the
    * jar-gated specs, the value parse by [[parseJsonPayload]]'s
    * MemoryStream contract test, all stateful logic via
    * MemoryStream/file sources).
    */
  def readKafka(
      spark: SparkSession,
      bootstrapServers: String,
      topic: String,
      schema: StructType,
      startingOffsets: String = "latest"): DataFrame =
    parseJsonPayload(
      spark.readStream
        .format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("subscribe", topic)
        .option("startingOffsets", startingOffsets)
        .load(),
      "value", schema)

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
    parseJsonPayload(
      spark.readStream
        .format("kinesis")
        .option("streamName", streamName)
        .option("region", region)
        .option("startingPosition", startingPosition)
        .load(),
      "data", schema)
}
