package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.config.{SourceConfig, StreamConfig}

/** Config-driven streaming pipeline — the SourceType.Stream branch of
  * the control plane (SURVEY §2.8/§2.9; workflow_definition.json:77-81
  * "stream is processed when data arrives").
  *
  * read (file landing prefix or Kafka topic) → optional stateful dedup
  * within the watermark → optional tumbling event-time aggregate →
  * sink (checkpointed parquet append, or foreachBatch → warehouse
  * publish when the config carries warehouse physical design and a
  * windowed aggregate).
  *
  * File-source schema comes from a one-time batch inference over the
  * already-landed files (the crawler-discovery analog): streams then
  * enforce it, so late schema drift fails loudly instead of silently
  * inferring per batch.
  */
object StreamPipeline {

  def run(spark: SparkSession, cfg: SourceConfig): StreamingQuery = {
    val st = cfg.stream.getOrElse(
      throw new IllegalArgumentException(s"source '${cfg.name}' has no stream section"))

    require(st.landingPath.nonEmpty,
      s"source '${cfg.name}': stream.landing_path must point at schema-sample " +
        "files (for kafka it declares the value schema; for file streams it " +
        "is the landing prefix)")
    val source: DataFrame = st.format.toLowerCase match {
      case "kafka" =>
        val schema = graft.sources.SourceReader.read(spark, "json", st.landingPath).schema
        StreamSource.readKafka(spark, st.brokers, st.topic, schema)
      case "broker" | "graft-broker" =>
        // The executed in-engine transport: `topic` is the broker log
        // directory; value schema from the landing samples like kafka.
        val schema = graft.sources.SourceReader.read(spark, "json", st.landingPath).schema
        StreamSource.readBroker(spark, st.topic, schema)
      case "kinesis" =>
        val schema = graft.sources.SourceReader.read(spark, "json", st.landingPath).schema
        StreamSource.readKinesis(spark, st.streamName, st.region, schema)
      case fmt =>
        val schema = graft.sources.SourceReader.read(spark, fmt, st.landingPath).schema
        StreamSource.readFiles(spark, fmt, st.landingPath, schema, st.maxFilesPerTrigger)
    }

    val deduped =
      if (st.dedupKeys.nonEmpty)
        StreamDedup.withinWatermark(source, st.watermarkColumn, st.watermarkDelay, st.dedupKeys)
      else source

    val shaped = st.windowDuration match {
      case Some(d) =>
        EventWindows.tumblingByType(
          deduped.withWatermark(st.watermarkColumn, st.watermarkDelay), d)
      case None => deduped
    }

    (st.windowDuration, cfg.warehouse) match {
      case (Some(_), Some(wh)) =>
        StreamSink.publishEachBatch(spark, shaped, wh, st.checkpointDir)
      case _ =>
        StreamSink.parquet(shaped, st.outputPath, st.checkpointDir)
    }
  }
}
