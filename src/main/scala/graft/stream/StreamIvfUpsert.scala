package graft.stream

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, min}
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

  // ---------------------------------------------------------------
  // The MAINTAINED stream: upsert + closed retrain loop per batch
  // ---------------------------------------------------------------

  /** The trained-at watermark of a MAINTAINED index — required, not
    * optional: the maintained serving/monitoring split rests on it
    * (published rows are ≤ watermark, live upserts are > it), so an
    * unwatermarked (pre-r15 or hand-published) index must fail fast
    * here rather than silently mis-split.
    */
  private def watermarkOf(spark: SparkSession, indexDir: String): Long =
    graft.ext.IvfIndex.trainedWatermarkOf(spark, indexDir).getOrElse(
      throw new IllegalStateException(
        s"$indexDir has no trained-at watermark — the maintained stream " +
          "requires a watermarked seed publish (IvfIndex.publishIndex with " +
          "trainedWatermark)"))

  /** The cell table the maintained stream SERVES and MONITORS: the
    * published version's rows (everything the last training saw,
    * vec_id ≤ watermark) plus upsert partitions newer than the
    * watermark. Upsert partitions at or below the watermark are
    * superseded by the retrain that covered them — they may even have
    * been assigned against older centroids — and are excluded, which is
    * what makes a replayed pre-retrain micro-batch harmless.
    */
  def servingCells(spark: SparkSession, indexDir: String,
      deltaDir: String): DataFrame = {
    val (_, published) = graft.ext.IvfIndex.readCurrentIndex(spark, indexDir)
    val w = watermarkOf(spark, indexDir)
    published.filter(col("vec_id") <= w)
      .unionByName(readIndex(spark, deltaDir).filter(col("vec_id") > w))
  }

  /** Fold-forward marker carrying the accumulated corpus row count as
    * `<lastBatchId>:<lastBatchRows>:<cumulativeRows>` — so a
    * maintenance tick derives K from metadata instead of re-counting
    * the (growing) corpus every micro-batch. Underscore-prefixed:
    * parquet discovery ignores it.
    */
  private[stream] val CorpusRowsMarker = "_CORPUS_ROWS"

  /** The corpus row count after batch `batchId` (of `batchN` rows)
    * landed, derived WITHOUT a corpus scan in the steady state: the
    * marker's cumulative count + this batch (or, on a replay of the
    * last failed batch, cumulative − its old rows + its new rows —
    * the landing is an idempotent partition overwrite). A missing
    * marker (first maintained tick, possibly over seed partitions from
    * the batch path) or an out-of-band landing (batch-id gap) falls
    * back to one real count, then the fold-forward resumes.
    */
  private[stream] def foldForwardCorpusRows(spark: SparkSession, corpusDir: String,
      batchId: Long, batchN: Long): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val cum = graft.sink.AtomicPointer.read(conf, corpusDir,
        name = CorpusRowsMarker) match {
      case Some(s) =>
        val parts = s.split(":").map(_.toLong)
        if (batchId == parts(0) + 1) parts(2) + batchN
        else if (batchId == parts(0)) parts(2) - parts(1) + batchN
        else spark.read.parquet(corpusDir).count()
      case None => spark.read.parquet(corpusDir).count()
    }
    graft.sink.AtomicPointer.write(conf, corpusDir, s"$batchId:$batchN:$cum",
      name = CorpusRowsMarker)
    cum
  }

  /** One measure→decide→act cycle of the maintained stream: health-
    * check the serving cells against the policy; on breach, retrain
    * from the ACCUMULATED corpus (the sampled trainer at the corpus-
    * size-derived stride — [[graft.ext.IvfIndex.maintainIndexOver]])
    * and atomically publish the next version. K re-derives from the
    * corpus each tick, so the geometry grows with the stream —
    * `knownCorpusRows` supplies the size from fold-forward metadata
    * (what [[startMaintained]] passes), keeping the no-breach tick
    * free of corpus-sized work; absent it, the tick counts once.
    */
  def maintainTick(spark: SparkSession, corpusDir: String, deltaDir: String,
      indexDir: String, iters: Int,
      policy: graft.ext.IvfIndex.RetrainPolicy,
      knownCorpusRows: Option[Long] = None): Boolean = {
    val corpus = spark.read.parquet(corpusDir).drop("batch_id")
    val w = watermarkOf(spark, indexDir)
    val n = knownCorpusRows.getOrElse(corpus.count())
    graft.ext.IvfIndex.maintainIndexOver(corpus,
      servingCells(spark, indexDir, deltaDir), col("vec_id") > w,
      graft.ext.SimSearch.IvfParams.forCorpus(n).numCentroids,
      iters, indexDir, policy)
  }

  /** Start the MAINTAINED stream — the full closed loop under
    * streaming ingestion. Each micro-batch: (1) lands its raw vectors
    * in `corpusDir` (idempotent `batch_id=` partitions — the retrain
    * corpus accumulates beside the index), (2) upserts against the
    * CURRENTLY PUBLISHED centroids (re-read per batch: a mid-stream
    * retrain flips them atomically under the `_CURRENT` pointer), and
    * (3) ticks [[maintainTick]]. Requires a watermarked seed publish at
    * `indexDir` (train the initial corpus through the batch path
    * first). Exactly-once: steps 1-2 are idempotent per batchId; a
    * replayed pre-retrain batch's delta partition is below the new
    * watermark and thus invisible to serving; step 3 after a replay is
    * a no-op (the rebased watermark sees no delta).
    *
    * HARD PRECONDITION — monotone vec_ids: the serving/monitoring
    * split is watermark-based, so a NEVER-SEEN batch carrying a
    * `vec_id ≤` the published watermark would land but be excluded
    * from serving (published lacks it, the delta filter drops it) and
    * from monitoring — silently vanishing until an unrelated retrain.
    * Each batch therefore fails fast if it is genuinely new (its
    * corpus partition does not already exist) and violates the
    * watermark. A REPLAYED batch legitimately sits at or below the
    * watermark when the crashed attempt's retrain covered it — its
    * partition already exists, so the check skips it.
    */
  def startMaintained(spark: SparkSession, vecs: DataFrame, corpusDir: String,
      deltaDir: String, indexDir: String, iters: Int,
      policy: graft.ext.IvfIndex.RetrainPolicy,
      checkpointDir: String): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val conf = spark.sparkContext.hadoopConfiguration
        val part = new Path(s"$corpusDir/batch_id=$batchId")
        val alreadyLanded = part.getFileSystem(conf).exists(part)
        val stats = batch.agg(min(col("vec_id")), count(lit(1))).head
        val batchN = stats.getLong(1)
        if (!alreadyLanded && batchN > 0L) {
          val w = watermarkOf(spark, indexDir)
          val mn = stats.getLong(0)
          require(mn > w, s"micro-batch $batchId carries vec_id $mn <= the " +
            s"published trained-at watermark $w: the maintained stream " +
            "requires monotone vec_ids (a non-monotone new row would be " +
            "invisible to serving and monitoring until an unrelated retrain)")
        }
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(corpusDir)
        val cum = foldForwardCorpusRows(spark, corpusDir, batchId, batchN)
        val (cents, _) = graft.ext.IvfIndex.readCurrentIndex(spark, indexDir)
        writeBatch(batch, batchId, cents, deltaDir)
        maintainTick(spark, corpusDir, deltaDir, indexDir, iters, policy,
          knownCorpusRows = Some(cum))
        ()
      }
      .start()
}
