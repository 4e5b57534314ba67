package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming IVF index maintenance — the continuous form of
  * [[graft.ext.IvfIndex]]'s retrain-free upsert: embedding vectors
  * arriving on a stream assign to the FROZEN centroids (map-only,
  * broadcast — a micro-batch's cost is O(batch·K), the landed index is
  * never read or rewritten) and land as (vec_id, cell) rows in their
  * own micro-batch partition. The shape a continuously-embedding
  * ingestion pipeline runs: the index trails the stream by one
  * micro-batch, serving stays [[graft.ext.IvfIndex.topKOverCells]]
  * over the accumulated cell table, and the batch `ivf_cell_stats`
  * monitor decides retraining exactly as in the batch path.
  *
  * Correctness is inherited, not re-proven: per-vector assignment
  * independence makes the accumulated index EQUAL to a one-shot
  * assignment of everything that has arrived, for ANY micro-batch
  * slicing (spec-asserted), the same invariant the batch upsert rests
  * on.
  *
  * Exactly-once: foreachBatch is at-least-once, so the sink is
  * idempotent per batchId — the [[StreamDecontam]] dynamic-partition-
  * overwrite pattern: a replayed micro-batch REPLACES its own
  * `batch_id=<id>` partition and never touches other batches' rows.
  */
object StreamIvfUpsert {

  /** One micro-batch's upsert, idempotent in `batchId`. */
  def writeBatch(batch: DataFrame, batchId: Long, cents: DataFrame,
      outDir: String): Unit =
    graft.ext.IvfIndex.assignCells(batch, cents)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(outDir)

  /** The accumulated (vec_id, cell) index as serving reads it. Serving
    * may start before the first micro-batch commits — an output dir
    * with no committed partition (or none at all) reads as an EMPTY
    * index, not an AnalysisException.
    */
  def readIndex(spark: SparkSession, outDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("vec_id", LongType), StructField("cell", LongType))))
    val fs = new org.apache.hadoop.fs.Path(outDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val committed = fs.exists(new org.apache.hadoop.fs.Path(outDir)) &&
      fs.listStatus(new org.apache.hadoop.fs.Path(outDir))
        .exists(_.getPath.getName.startsWith("batch_id="))
    if (committed) spark.read.parquet(outDir).drop("batch_id") else empty
  }

  /** Start the maintenance stream: one idempotent index partition per
    * micro-batch of arriving vectors.
    */
  def start(spark: SparkSession, vecs: DataFrame, cents: DataFrame,
      outDir: String, checkpointDir: String): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, batchId, cents, outDir)
      }
      .start()
}
