package graft.stream

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.config.CurationConfig
import graft.ext.{NearDup, TextAnalysis}
import graft.transform.CurationCompiler

/** The FULL config-compiled curation chain as a stream: documents
  * arriving on a stream land in an idempotent landing zone, and each
  * micro-batch re-materializes the curated corpus — optional eval-set
  * decontamination gate, then gate → dedup → mix → chunk → shard via
  * [[CurationCompiler.compile]] VERBATIM (the same code path the
  * `cfg_curation` registered query gates). The streaming twin of
  * `cfg_curation`, driven from the same `curation:` config section.
  *
  * Two maintenance modes:
  *
  * **Re-materialize** ([[start]]): each micro-batch re-runs the batch
  * chain over the accumulated landing zone. Semantically bulletproof
  * (after the last batch the output IS `compile(cu)(allDocs)` by
  * construction) but O(corpus) work per batch — the right mode for
  * bounded corpora or slow triggers.
  *
  * **Incremental** ([[startIncremental]]): per-batch work touching
  * TEXT is bounded by the batch — the quality gate, digesting,
  * chunking, and shingling run on batch rows only — and everything
  * corpus-global is maintained as fixed-width metadata state:
  *  - `index/v=N`: the exact-dedup winner per digest (digest, min id,
  *    stratum) — the min-merge against each batch is the
  *    incremental-rollup fold, replay-idempotent because version N is
  *    a deterministic function of version N-1 plus batch N.
  *  - `counts/v=N`: per-stratum winner counts for the temperature
  *    mix, folded from batch deltas (+ new winner, − displaced,
  *    − revoked), never recomputed from the corpus. NULL strata keep
  *    their group: the batch chain's count table includes it (it
  *    participates in n_min even though the mix join drops null-key
  *    rows), so the fold must too.
  *  - `chunks/batch_id=N`: context-window chunk METADATA (id,
  *    chunk_id, n_chunk_tokens, chunk_hash, __key) of the batch's new
  *    winners — chunking is per-doc deterministic, so chunks computed
  *    at arrival equal chunks computed over the full corpus. No text
  *    column is ever stored.
  *  - `shingles/batch_id=N/hb=B` + `evalsh/batch_id=N` (decontam
  *    only): hashed shingle sets per NEW digest (bucketed on
  *    `h mod` [[ShingleBuckets]], so the retroactive-revocation probe
  *    prunes to the eval delta's buckets instead of scanning the
  *    accumulated store) and per eval row. Arriving
  *    candidates are checked against the full eval state; arriving
  *    eval rows retroactively REVOKE already-accepted digests (the
  *    full-recompute semantics: an eval row contaminates documents
  *    that arrived before it). Each (doc, eval) pair is checked
  *    exactly once — at whichever arrives later — with both shingle
  *    sets complete, so the monotone contamination verdict matches
  *    the batch chain. Identical text ⇒ identical digest ⇒ identical
  *    shingles, so a digest group is contaminated all-or-nothing and
  *    revocation can operate on winners alone.
  *
  * Only the OUTPUT-sized tail (mix keep + shard prefix sum over chunk
  * metadata) re-materializes per batch — the streamed-MV maintenance
  * shape, all fixed-width columns, no text.
  *
  * Exactly-once (both modes): state writes are deterministic
  * functions of (prior-version state, batch) keyed by batchId, and
  * the output commit is one ATOMIC pointer swap — `v=<batchId>` dirs
  * plus a `_CURRENT` pointer file renamed into place with
  * Rename.OVERWRITE, so [[readOutput]] sees old-or-new, never a
  * half-overwritten directory (and a replayed micro-batch reproduces
  * byte-identical state).
  */
object StreamCuration {

  /** Bucket count for NEWLY CREATED shingle stores (`hb = h mod
    * buckets` partition dirs): revocation probes prune to the eval
    * delta's buckets. The bound is pinned by the probe arithmetic, not
    * by file-size mechanics: a revocation delta of E eval shingles
    * touches min(E, buckets) buckets, so the pruning factor saturates
    * at `buckets` — at 64 a typical ≤10-shingle eval delta still skips
    * ≥84% of the store, while per-batch writes stay ≤64 files (a
    * 10k-batch/day stream stays under the small-file line). A store's
    * ACTUAL count is versioned in its `_BUCKETS` marker
    * ([[shingleLayout]]), so this default can change — or a deployment
    * can pick a larger count for a bigger eval suite — without breaking
    * any existing store's pruning or readability.
    */
  val ShingleBuckets = 64

  /** Name of the shingle store's layout marker file: the bucket count
    * its `hb=` partition dirs were written with. Underscore-prefixed,
    * so parquet discovery ignores it.
    */
  private[graft] val BucketsMarkerName = "_BUCKETS"

  /** The landed shingle store's layout, probed from disk — the
    * backward-compatibility seam: stores written before bucketing (or
    * mixed, if a legacy checkpoint resumed under a bucketing engine)
    * must keep REVOCATION CORRECT even though they cannot prune.
    */
  private[graft] sealed trait ShingleLayout
  private[graft] object ShingleLayout {
    /** Every batch dir carries `hb=` partitions written at `buckets`. */
    final case class Bucketed(buckets: Int) extends ShingleLayout
    /** At least one batch dir predates bucketing: reads must go per-dir
      * and unpruned (mixed dirs break whole-store partition discovery).
      */
    case object Legacy extends ShingleLayout
    /** No batch has landed shingles yet. */
    case object Empty extends ShingleLayout
  }

  /** Probe `storeDir`'s layout: the `_BUCKETS` marker wins (the
    * versioned contract); absent a marker, a store whose every batch
    * dir is `hb=`-partitioned is a pre-marker bucketed store at the
    * default count; anything else is legacy/mixed.
    */
  private[graft] def shingleLayout(spark: SparkSession,
      storeDir: String): ShingleLayout = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(storeDir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) ShingleLayout.Empty
    else graft.sink.AtomicPointer.read(conf, storeDir,
        name = BucketsMarkerName) match {
      case Some(n) => ShingleLayout.Bucketed(n.toInt)
      case None =>
        val batchDirs = fs.listStatus(p).filter(s =>
          s.isDirectory && s.getPath.getName.startsWith("batch_id="))
        if (batchDirs.isEmpty) ShingleLayout.Empty
        else if (batchDirs.forall(d => fs.listStatus(d.getPath).exists(c =>
          c.isDirectory && c.getPath.getName.startsWith("hb="))))
          // Pinned to LITERAL 64, not ShingleBuckets: marker-less
          // bucketed stores can only have been written by the r14
          // engine, whose (only ever) bucket count was 64. Tracking
          // the default here would, after a default change, prune
          // `hb` (written mod 64) against probes computed mod the new
          // default — silently missing revocations.
          ShingleLayout.Bucketed(64)
        else ShingleLayout.Legacy
    }
  }

  /** `(__h, h)` rows of the accumulated shingle store, restricted —
    * when the layout allows pruning — to the buckets an eval-shingle
    * delta can touch. Bucketed stores read only the delta's ≤buckets
    * `hb=` partition dirs (revocation work follows the DELTA's size);
    * legacy/mixed stores fall back to an unpruned PER-BATCH-DIR union
    * (whole-store discovery over mixed dirs throws on conflicting
    * structures), trading the pruning away but never correctness.
    */
  private[graft] def shingleStateFor(spark: SparkSession, storeDir: String,
      evalDelta: DataFrame): DataFrame = shingleLayout(spark, storeDir) match {
    case ShingleLayout.Bucketed(nb) =>
      // Buckets the eval delta can possibly touch (≤ nb ints — a
      // KB-scale metadata collect).
      val probed = evalDelta
        .select(pmod(col("h"), lit(nb)).cast("int").as("hb"))
        .distinct().collect().map(_.getInt(0)).toSeq
      spark.read.parquet(storeDir)
        .filter(col("hb").isin(probed: _*))
        .select(col("__h"), col("h"))
    case ShingleLayout.Legacy =>
      val conf = spark.sparkContext.hadoopConfiguration
      val p = new Path(storeDir)
      val fs = p.getFileSystem(conf)
      fs.listStatus(p).map(_.getPath)
        .filter(d => d.getName.startsWith("batch_id="))
        .map(d => spark.read.parquet(d.toString).select(col("__h"), col("h")))
        .reduceLeft(_ unionByName _)
    case ShingleLayout.Empty =>
      emptyDf(spark, StructType(Seq(StructField("__h", StringType),
        StructField("h", LongType))))
  }

  // ---------------------------------------------------------------
  // Atomic versioned output publish (shared by both modes)
  // ---------------------------------------------------------------

  /** Write `df` as `outDir/v=<version>` and atomically re-point
    * `_CURRENT` at it. Retention keeps the two newest versions so an
    * in-flight reader of the previous version finishes its scan.
    */
  private[stream] def publishOutput(df: DataFrame, outDir: String,
      version: Long): Unit = {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    df.write.mode("overwrite").parquet(s"$outDir/v=$version")
    val dir = new Path(outDir)
    graft.sink.AtomicPointer.write(conf, outDir, s"v=$version")
    // Retention AFTER the swap: drop all but the two newest versions.
    val fs = dir.getFileSystem(conf)
    val vs = fs.listStatus(dir).map(_.getPath).flatMap { p =>
      val n = p.getName
      if (n.startsWith("v=")) scala.util.Try(n.drop(2).toLong).toOption.map(_ -> p)
      else None
    }.sortBy(-_._1)
    vs.drop(2).foreach { case (_, p) => fs.delete(p, true) }
  }

  /** Read the currently-published output: follow the `_CURRENT`
    * pointer (atomic with the publish — never a partial directory).
    */
  def readOutput(spark: SparkSession, outDir: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val version = graft.sink.AtomicPointer.read(conf, outDir).getOrElse(
      throw new IllegalStateException(
        s"$outDir has no _CURRENT pointer — no batch has published yet"))
    spark.read.parquet(s"$outDir/$version")
  }

  // ---------------------------------------------------------------
  // Re-materialize mode (the semantics baseline)
  // ---------------------------------------------------------------

  /** The curation chain over the accumulated landing zone: drop eval
    * rows and contaminated documents when a `decontam:` section is
    * present, then [[CurationCompiler.compile]] verbatim.
    */
  def curate(spark: SparkSession, cu: CurationConfig,
      landingDir: String): DataFrame = {
    val corpus0 = spark.read.parquet(landingDir).drop("batch_id")
    val corpus = cu.decontam match {
      case Some(dc) =>
        val hits = CurationCompiler
          .compileDecontam(dc, cu.idField, cu.textField)(corpus0)
          .select(col("doc_id").as(cu.idField)).distinct()
        corpus0.filter(!expr(dc.evalWhere))
          .join(hits, Seq(cu.idField), "left_anti")
      case None => corpus0
    }
    CurationCompiler.compile(cu)(corpus)
  }

  /** One micro-batch: idempotent landing append (batchId partition,
    * overwritten on replay) + re-materialization of the curated
    * output, committed by one atomic pointer swap.
    */
  def writeBatch(batch: DataFrame, batchId: Long, cu: CurationConfig,
      landingDir: String, outDir: String): Unit = {
    batch.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(landingDir)
    publishOutput(curate(batch.sparkSession, cu, landingDir), outDir, batchId)
  }

  def start(spark: SparkSession, docs: DataFrame, cu: CurationConfig,
      landingDir: String, outDir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, batchId, cu, landingDir, outDir)
      }
      .start()

  // ---------------------------------------------------------------
  // Incremental mode (bounded per-batch text work)
  // ---------------------------------------------------------------

  /** Newest state version strictly below `below`, or None before the
    * first batch. Strictness is the replay guarantee: a replayed
    * batch N reads version N-1 (still retained), never its own
    * possibly-partial v=N.
    */
  private def latestVersion(spark: SparkSession, dir: String,
      below: Long): Option[Long] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .flatMap(n => scala.util.Try(n.drop(2).toLong).toOption)
      .filter(_ < below)
      .maxOption
  }

  private def dirExists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def chunkSchema(cu: CurationConfig): StructType = StructType(Seq(
    StructField(cu.idField, LongType), StructField("chunk_id", LongType),
    StructField("n_chunk_tokens", LongType), StructField("chunk_hash", StringType),
    StructField("__key", LongType)))

  private def emptyDf(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** One incremental micro-batch. All text-bearing work (decontam
    * check, gate, digest, chunking, shingling) reads ONLY `batch0`;
    * the maintained state and the re-materialized tail are fixed-width
    * metadata.
    */
  def writeBatchIncremental(batch0: DataFrame, batchId: Long,
      cu: CurationConfig, stateDir: String, outDir: String): Unit = {
    val spark = batch0.sparkSession
    val idF = cu.idField; val textF = cu.textField; val stratF = cu.stratumField
    val batch = batch0.cache()
    val prevV = latestVersion(spark, s"$stateDir/index", below = batchId)
    val oldIndex = prevV.map(v => spark.read.parquet(s"$stateDir/index/v=$v"))
    val oldCounts = prevV.map(v => spark.read.parquet(s"$stateDir/counts/v=$v"))

    // -- 1. decontam: land the batch's eval shingles, then gate
    //    arriving candidates against the FULL eval state (old evals +
    //    this batch's). Per-(doc, eval) check with complete shingle
    //    sets — the later arrival pays it.
    val cand = cu.decontam match {
      case Some(dc) =>
        val evalPred = expr(dc.evalWhere)
        val newEvalSh = NearDup.shingleSets(
            batch.filter(evalPred), idF, textF, dc.shingleLen)
          .select(col("doc_id").as("eval_id"), explode(col("hs")).as("h"))
        newEvalSh.write.mode("overwrite")
          .parquet(s"$stateDir/evalsh/batch_id=$batchId")
        val evalShAll = spark.read.parquet(s"$stateDir/evalsh")
          .select(col("eval_id"), col("h"))
        val candDocs = batch.filter(!evalPred)
        val candSh = NearDup.shingleSets(candDocs, idF, textF, dc.shingleLen)
          .select(col("doc_id"), explode(col("hs")).as("h"))
        // hs arrays are distinct, so count(*) is the distinct-shared count.
        val contaminated = candSh.join(broadcast(evalShAll), Seq("h"))
          .groupBy(col("doc_id"), col("eval_id"))
          .agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= dc.minShared)
          .select(col("doc_id").as(idF)).distinct()
        candDocs.join(contaminated, Seq(idF), "left_anti")
      case None => batch.toDF()
    }

    // -- 2. gate (the batch chain's exact expressions) + digest
    val gated = CurationCompiler.gate(cu)(cand).cache()
    val digest = cu.dedup match {
      case "exact" => md5(col(textF).cast("binary"))
      // 'none' still flows through the index: a unique per-id digest
      // makes every gated row its own singleton winner.
      case "none" => concat(lit("id:"), col(idF).cast("string"))
      case other => throw new IllegalArgumentException(
        s"curation.dedup must be 'exact' or 'none', got '$other'")
    }
    val batchBest = gated.withColumn("__h", digest)
      .groupBy(col("__h"))
      .agg(min(col(idF)).as("b_id"),
        min_by(col(stratF), col(idF)).as("b_stratum"),
        min_by(col(textF), col(idF)).as("b_text"))

    // -- 3. the min-merge fold: old index FULL OUTER batch winners
    // Fresh empty relation (not batchBest.limit(0)): sharing lineage
    // with batchBest would make the full-outer below a self-join.
    val o = oldIndex.getOrElse {
      val bs = batchBest.schema
      emptyDf(spark, StructType(Seq(
        StructField("__h", bs("__h").dataType),
        StructField("id", bs("b_id").dataType),
        StructField("stratum", bs("b_stratum").dataType))))
    }
    val joined = o.select(col("__h"), col("id").as("o_id"),
        col("stratum").as("o_stratum"))
      .join(batchBest, Seq("__h"), "full_outer")
      .cache()
    val batchWins = col("b_id").isNotNull &&
      (col("o_id").isNull || col("b_id") < col("o_id"))
    val newWinners = joined.filter(batchWins)
      .select(col("__h"), col("b_id").as("id"), col("b_stratum").as("stratum"),
        col("b_text").as("text"), col("o_id"))
      .cache() // batch-bounded
    val displacedOld = joined.filter(col("o_id").isNotNull && batchWins)
      .select(col("__h"), col("o_stratum"))
    val merged = joined.select(col("__h"),
      when(batchWins, col("b_id")).otherwise(col("o_id")).as("id"),
      when(batchWins, col("b_stratum")).otherwise(col("o_stratum")).as("stratum"))

    // -- 4. retroactive revocation: digests accepted BEFORE this batch
    //    whose text is contaminated by this batch's NEW eval rows.
    //    (New digests were already checked against the full eval state
    //    at arrival, so only old-index digests need the delta check.)
    val revoked: DataFrame = cu.decontam match {
      case Some(dc) if prevV.isDefined &&
          dirExists(spark, s"$stateDir/shingles") &&
          dirExists(spark, s"$stateDir/evalsh/batch_id=$batchId") =>
        val newEvalShPart =
          spark.read.parquet(s"$stateDir/evalsh/batch_id=$batchId")
        // The store scan prunes to the eval delta's `hb=` buckets when
        // the landed layout supports it (revocation work follows the
        // DELTA's size, not the accumulated store's); a legacy
        // pre-bucketing store falls back to an unpruned per-dir scan —
        // see [[shingleStateFor]].
        val shState = shingleStateFor(spark, s"$stateDir/shingles",
            newEvalShPart)
          .join(o.select(col("__h")), Seq("__h"), "left_semi")
        shState.join(broadcast(newEvalShPart.select(col("eval_id"), col("h"))),
            Seq("h"))
          .groupBy(col("__h"), col("eval_id"))
          .agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= dc.minShared)
          .select(col("__h")).distinct()
      case _ => emptyDf(spark, StructType(Seq(StructField("__h", StringType))))
    }
    // Eagerly materialized (it is revoked-digest-sized): its plan reads
    // the shingle store, whose batch-N partition step 6 OVERWRITES on a
    // replay — without the checkpoint a later action re-executing this
    // plan would chase deleted files.
    val revokedM = revoked.localCheckpoint(true)
    val newIndex = merged.join(revokedM, Seq("__h"), "left_anti")
    newIndex.write.mode("overwrite").parquet(s"$stateDir/index/v=$batchId")

    // -- 5. stratum-count fold (the incremental-agg shape): batch
    //    deltas only, never a corpus recount. groupBy keeps the NULL
    //    stratum group, matching the batch chain's count table.
    val adds = newWinners.join(revokedM, Seq("__h"), "left_anti")
      .select(col("stratum").as(stratF), lit(1L).as("__d"))
    val dropsDisplaced = displacedOld.join(revokedM, Seq("__h"), "left_anti")
      .select(col("o_stratum").as(stratF), lit(-1L).as("__d"))
    val dropsRevoked = o.join(revokedM, Seq("__h"), "left_semi")
      .select(col("stratum").as(stratF), lit(-1L).as("__d"))
    val prior = oldCounts.getOrElse(
        emptyDf(spark, StructType(Seq(
          StructField(stratF, newIndex.schema("stratum").dataType),
          StructField("__n", LongType)))))
      .select(col(stratF), col("__n").as("__d"))
    val newCounts = prior.unionByName(adds).unionByName(dropsDisplaced)
      .unionByName(dropsRevoked)
      .groupBy(col(stratF)).agg(sum(col("__d")).as("__n"))
      .filter(col("__n") > 0)
    newCounts.write.mode("overwrite").parquet(s"$stateDir/counts/v=$batchId")

    // -- 6. chunk metadata for this batch's new winners (per-doc
    //    deterministic ⇒ arrival-time chunks equal corpus chunks);
    //    shingle sets for NEW digests (revocation state).
    val newWinDocs = newWinners.select(col("id").as(idF), col("text").as(textF))
    CurationCompiler.chunksKeyed(cu)(newWinDocs)
      .select(col(idF), col("chunk_id"), col("n_chunk_tokens"),
        col("chunk_hash"), col("__key"))
      .write.mode("overwrite").parquet(s"$stateDir/chunks/batch_id=$batchId")
    if (cu.decontam.isDefined) {
      // Bucketed by shingle hash (hb = h mod buckets, the K9 layout
      // idea as partition dirs): the shingle store is corpus-shingle-
      // sized at scale, and revocation (step 4) probes it with a
      // usually-tiny eval delta — bucket dirs let that scan PRUNE to
      // the delta's buckets instead of reading the store. The bucket
      // count comes from the store's OWN layout (its `_BUCKETS` marker
      // — never re-bucket an existing store under a changed default);
      // a legacy store keeps its unbucketed layout so its per-dir
      // fallback reads stay structurally uniform.
      val storeDir = s"$stateDir/shingles"
      val layout = shingleLayout(spark, storeDir)
      val sh = NearDup.shingleSets(
          newWinners.filter(col("o_id").isNull)
            .select(col("__h"), col("text").as(textF)),
          "__h", textF, cu.decontam.get.shingleLen)
        .select(col("doc_id").as("__h"), explode(col("hs")).as("h"))
      layout match {
        case ShingleLayout.Legacy =>
          sh.write.mode("overwrite")
            .parquet(s"$storeDir/batch_id=$batchId")
        case _ =>
          val nb = layout match {
            case ShingleLayout.Bucketed(b) => b
            case _ => ShingleBuckets
          }
          sh.withColumn("hb", pmod(col("h"), lit(nb)).cast("int"))
            .write.mode("overwrite")
            .partitionBy("hb")
            .parquet(s"$storeDir/batch_id=$batchId")
          // Version the layout AFTER the first bucketed write: the
          // marker is the store's contract for every later read/write.
          graft.sink.AtomicPointer.write(
            spark.sparkContext.hadoopConfiguration, storeDir, nb.toString,
            name = BucketsMarkerName)
      }
    }

    // -- 7. bounded-work stats (the per-batch evidence): every count
    //    here is a function of the BATCH, not the corpus, except
    //    index_rows which records the state size.
    val stats = Map(
      "batch_rows" -> batch.count(),
      "gated_rows" -> gated.count(),
      "new_winner_rows" -> newWinners.count(),
      "index_rows" -> newIndex.count())
    writeStats(spark, s"$stateDir/stats/p=$batchId", batchId, stats)

    // -- 8. output tail over metadata only + atomic publish
    publishOutput(buildOutput(spark, cu, stateDir, batchId), outDir, batchId)

    // Retention: state versions older than prevV are no longer needed
    // even by a replay (a replayed batch N reads exactly v=N-1).
    prevV.foreach { pv =>
      val conf = spark.sparkContext.hadoopConfiguration
      Seq("index", "counts").foreach { sub =>
        val d = new Path(s"$stateDir/$sub")
        val fs = d.getFileSystem(conf)
        if (fs.exists(d)) fs.listStatus(d).map(_.getPath).foreach { p =>
          scala.util.Try(p.getName.drop(2).toLong).toOption
            .filter(v => p.getName.startsWith("v=") && v < pv)
            .foreach(_ => fs.delete(p, true))
        }
      }
    }
    joined.unpersist(); newWinners.unpersist(); gated.unpersist()
    batch.unpersist()
  }

  /** The output-sized tail over state version `v`: winners → mix keep
    * (maintained counts) → chunk-metadata join → shard prefix sum.
    * Reads only fixed-width state — no scan in this plan carries the
    * text column (spec-asserted).
    */
  private def buildOutput(spark: SparkSession, cu: CurationConfig,
      stateDir: String, v: Long): DataFrame = {
    val winners = spark.read.parquet(s"$stateDir/index/v=$v")
      .select(col("id").as(cu.idField), col("stratum").as(cu.stratumField))
    val kept =
      if (cu.mix) {
        val counts = spark.read.parquet(s"$stateDir/counts/v=$v")
        TextAnalysis.temperatureMixWithCounts(
          winners, cu.idField, cu.stratumField, counts)
      } else winners
    val chunkStore =
      if (dirExists(spark, s"$stateDir/chunks"))
        spark.read.parquet(s"$stateDir/chunks").drop("batch_id")
      else emptyDf(spark, chunkSchema(cu))
    val keptChunks = chunkStore
      .join(kept.select(col(cu.idField)), Seq(cu.idField), "left_semi")
    CurationCompiler.shardJoin(cu)(keptChunks)
  }

  /** The current incremental output as a DataFrame built from state —
    * the spec's plan-assert hook (no text column in any scan, every
    * scan under `stateDir`).
    */
  def incrementalOutput(spark: SparkSession, cu: CurationConfig,
      stateDir: String): DataFrame = {
    val v = latestVersion(spark, s"$stateDir/index", below = Long.MaxValue)
      .getOrElse(throw new IllegalStateException(
        s"$stateDir has no index versions — no batch has run yet"))
    buildOutput(spark, cu, stateDir, v)
  }

  /** Per-batch stats as written by [[writeBatchIncremental]] — the
    * bounded-work audit trail. Returns (batch_id → stat map).
    */
  def readStats(spark: SparkSession,
      stateDir: String): Map[Long, Map[String, Long]] = {
    if (!dirExists(spark, s"$stateDir/stats")) return Map.empty
    spark.read.parquet(s"$stateDir/stats").drop("p").collect().map { r =>
      r.getAs[Long]("batch_id") -> Map(
        "batch_rows" -> r.getAs[Long]("batch_rows"),
        "gated_rows" -> r.getAs[Long]("gated_rows"),
        "new_winner_rows" -> r.getAs[Long]("new_winner_rows"),
        "index_rows" -> r.getAs[Long]("index_rows"))
    }.toMap
  }

  private def writeStats(spark: SparkSession, dir: String, batchId: Long,
      stats: Map[String, Long]): Unit = {
    import spark.implicits._
    Seq((batchId, stats("batch_rows"), stats("gated_rows"),
        stats("new_winner_rows"), stats("index_rows")))
      .toDF("batch_id", "batch_rows", "gated_rows", "new_winner_rows",
        "index_rows")
      .write.mode("overwrite").parquet(dir)
  }

  def startIncremental(spark: SparkSession, docs: DataFrame,
      cu: CurationConfig, stateDir: String, outDir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatchIncremental(batch, batchId, cu, stateDir, outDir)
      }
      .start()
}
