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

  /** Streaming CDC materialization: apply each micro-batch of a change
    * feed to the CURRENT published version via
    * [[graft.transform.CdcMerge]] and republish through the atomic
    * view-pointer swap — a continuously-upserted table whose readers
    * only ever see a complete version. Per batch the base side is one
    * broadcast anti-join pass (never a base shuffle); sequence numbers
    * resolve ordering WITHIN a batch, batch order resolves it across
    * batches (CDC log offsets are monotone, so the two agree for a
    * well-formed feed). The table must already be published once (the
    * initial snapshot) before the stream starts.
    */
  def mergeEachBatch(
      spark: SparkSession,
      changes: DataFrame,
      cfg: WarehouseConfig,
      key: String,
      checkpointDir: String,
      opCol: String = "op",
      seqCol: String = "seq"): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val base = spark.table(cfg.qualified)
          val merged = graft.transform.CdcMerge
            .applyChanges(base, batch, key, opCol, seqCol)
          WarehousePublisher.publish(spark, merged, cfg)
          ()
        }
      }
      .start()

  /** Streaming rollup maintenance (incremental-view-maintenance on a
    * stream): each micro-batch of RAW events is aggregated to its own
    * per-key partial, folded into the CURRENT published rollup via
    * [[graft.transform.IncrementalAgg.merge]], and republished through
    * the atomic view-pointer swap. Unlike `publishEachBatch` (complete
    * mode — recompute everything per trigger) and unlike a stateful
    * streaming aggregation (rollup lives in the state store), the
    * accumulated state here IS the published table: per batch the cost
    * is the batch's own aggregate plus a |distinct keys| merge join,
    * readers time-travel the rollup's history for free, and a restart
    * needs no state-store recovery — the last published version is the
    * state. Measures must be sum-decomposable (IncrementalAgg's
    * contract). The table must be published once (even empty-keyed)
    * before the stream starts.
    */
  private val AppliedBatchKey = "graft.applied_batch"

  /** One guarded fold: skip if the CURRENT version already carries this
    * batch id (foreachBatch is at-least-once — a crash between the
    * checkpoint commit and the view swap redelivers the batch), else
    * merge and publish with the batch id stamped as a table property.
    * The stamp rides the physical version BEFORE the view swap
    * ([[WarehousePublisher.publish]] `properties`), so marker and data
    * commit in the same atomic pointer move — the redelivered batch
    * sees either both (skips) or neither (refolds), never a half.
    */
  def applyRollupBatch(
      spark: SparkSession,
      batch: DataFrame,
      batchId: Long,
      cfg: WarehouseConfig,
      keys: Seq[String],
      measures: Seq[String],
      aggOf: DataFrame => DataFrame): Unit = {
    val applied = WarehousePublisher
      .currentProperty(spark, cfg.qualified, AppliedBatchKey).map(_.toLong)
    if (applied.forall(_ < batchId)) {
      val merged = graft.transform.IncrementalAgg
        .merge(spark.table(cfg.qualified), aggOf(batch), keys, measures)
      WarehousePublisher.publish(spark, merged, cfg,
        properties = Map(AppliedBatchKey -> batchId.toString))
      ()
    }
  }

  def rollupEachBatch(
      spark: SparkSession,
      events: DataFrame,
      cfg: WarehouseConfig,
      keys: Seq[String],
      measures: Seq[String],
      aggOf: DataFrame => DataFrame,
      checkpointDir: String): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          applyRollupBatch(spark, batch, batchId, cfg, keys, measures, aggOf)
      }
      .start()

  /** Streaming incremental dedup: each micro-batch of documents probes
    * the LANDED near-dup index ([[graft.ext.NearDup.incrementalPairs]])
    * and only novel documents (no base match at `threshold`) land at
    * `outDir`; matched docs are dropped as duplicates. The composition
    * a continuously-ingesting corpus pipeline runs: the 100 TB base
    * index is read per batch off its bucketed layout — never rebuilt,
    * never shuffled — and each batch pays work proportional to its own
    * size.
    *
    * The match decision is per-batch-vs-base only (batch-internal dups
    * pass; they are the NEXT compaction's exact-dedup job) — keeping
    * the micro-batch path idempotent and order-insensitive.
    */
  def dedupEachBatch(
      spark: SparkSession,
      docs: DataFrame,
      baseKeysTable: String,
      baseShinglesTable: String,
      threshold: Double,
      outDir: String,
      checkpointDir: String,
      idCol: String = "doc_id",
      textCol: String = "text"): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val dupIds = graft.ext.NearDup.incrementalPairs(
              batch, idCol, textCol, threshold,
              spark.table(baseKeysTable), spark.table(baseShinglesTable))
            .select(org.apache.spark.sql.functions.col("new_id").as(idCol))
            .distinct()
          batch.join(dupIds, Seq(idCol), "left_anti")
            .write.mode("append").parquet(outDir)
          ()
        }
      }
      .start()
}
