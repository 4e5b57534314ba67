package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  */
object StreamDecontam {

  /** Start a stream that appends (id, n_windows, n_hit, hit_frac,
    * contaminated) parquet for every arriving document with at least
    * one full window.
    */
  def start(spark: SparkSession, docs: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, windowLen: Int,
      outDir: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.ext.SubstrDedup
          .contaminationRate(batch, evalSet, idCol, textCol, windowLen)
          .write.mode("append").parquet(outDir)
      }
      .start()
}
