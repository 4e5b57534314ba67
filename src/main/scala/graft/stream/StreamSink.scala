package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.config.WarehouseConfig
import graft.sink.WarehousePublisher

/** Streaming sinks (SURVEY §2.8 St4).
  *
  * - `parquet`: append-mode file sink with checkpoint — the streaming
  *   analog of the raw-zone landing (K3): exactly-once file commits via
  *   the checkpoint + file-sink log.
  * - `publishEachBatch`: `foreachBatch` → the same atomic
  *   [[WarehousePublisher]] staging-swap used by batch (K4/K5) — each
  *   micro-batch republishes the current result table all-or-nothing,
  *   which is the reference's per-run Redshift COPY+swap applied per
  *   trigger.
  */
object StreamSink {

  def parquet(
      df: DataFrame,
      path: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .start()

  /** Publish each micro-batch's full result through the atomic staging
    * swap. Use with complete-mode-style aggregates recomputed per batch
    * or with `outputMode("update")` upserts folded into the batch frame.
    */
  def publishEachBatch(
      spark: SparkSession,
      df: DataFrame,
      cfg: WarehouseConfig,
      checkpointDir: String): StreamingQuery =
    df.writeStream
      .outputMode("complete")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) { WarehousePublisher.publish(spark, batch, cfg); () }
      }
      .start()
}
