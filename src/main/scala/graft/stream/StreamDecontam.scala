package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming eval-set decontamination: documents arriving on a stream
  * are scored against a STATIC held-out benchmark with the exact
  * [[graft.ext.SubstrDedup.contaminationRate]] semantics (sliding-
  * window hit fraction, integer 70% flag) before they are admitted to
  * the corpus — the shape a continuously-ingesting training-data
  * pipeline actually runs (the benchmark is fixed; the crawl is not).
  *
  * Execution shape: every document row is SELF-CONTAINED (its score
  * depends only on its own text and the static eval set), so no
  * streaming state, watermark, or cross-batch shuffle is needed — the
  * per-micro-batch frame runs the identical batch operator via
  * foreachBatch, the [[StreamSink]] pattern. The eval window set is
  * derived once per micro-batch from the static frame and broadcast;
  * Spark folds the static subtree's reuse across batches. Batch
  * parity is therefore structural: a document scores the same
  * whichever micro-batch it arrives in (spec-asserted by splitting
  * the corpus across batches).
  *
  * Exactly-once: foreachBatch gives at-least-once delivery (a crash
  * between the parquet write and the checkpoint commit replays the
  * micro-batch), so the sink must be IDEMPOTENT per batchId. Each
  * batch lands in its own `batch_id=<id>` partition via dynamic
  * partition overwrite — a replayed batch REPLACES its partition
  * instead of appending a duplicate copy. [[readOutput]] is the
  * consumer view with the bookkeeping column dropped.
  */
object StreamDecontam {

  /** One micro-batch's write, idempotent in `batchId`: dynamic
    * partition overwrite replaces exactly the `batch_id=<batchId>`
    * directory on replay, never touching other batches' partitions.
    */
  def writeBatch(batch: DataFrame, batchId: Long, evalSet: DataFrame,
      idCol: String, textCol: String, windowLen: Int,
      outDir: String): Unit =
    graft.ext.SubstrDedup
      .contaminationRate(batch, evalSet, idCol, textCol, windowLen)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(outDir)

  /** The scored stream as consumers read it (bookkeeping partition
    * column dropped).
    */
  def readOutput(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir).drop("batch_id")

  /** Start a stream that lands (id, n_windows, n_hit, hit_frac,
    * contaminated) parquet for every arriving document with at least
    * one full window, one idempotent partition per micro-batch.
    */
  def start(spark: SparkSession, docs: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, windowLen: Int,
      outDir: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, batchId, evalSet, idCol, textCol, windowLen, outDir)
      }
      .start()
}
