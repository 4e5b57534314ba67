package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Landed-IVF index MAINTENANCE: build the cell table for a base
  * corpus, then UPSERT later-arriving vectors by assigning them to the
  * FROZEN centroids and appending their (vec_id, cell) rows — no
  * retraining, no base rescan. This is the operational half of IVF
  * serving that [[SimSearch]]'s one-shot builders don't exercise: a
  * production index ingests deltas continuously and only retrains when
  * cell balance degrades, because retraining invalidates every landed
  * assignment while an upsert touches exactly the delta.
  *
  * Reference scope: the reference pipeline re-lands whole tables per
  * run (`/root/reference/README.md` processing flow); incremental
  * index maintenance is part of the beyond-reference LLM-serving
  * surface (brief: similarity search at 100 TB).
  *
  * Scale shape: the upsert is map-only — centroids broadcast, each
  * delta vector computes K rounded cosines and takes a
  * map-side-combined argmax; the append writes delta-sized output. The
  * base corpus is NEVER read (spec-pinned via the scan's pushed
  * filter). Serving over the merged cell table is the standard probe +
  * exact re-rank plan: probed (qid, cell) pairs broadcast against the
  * cell-keyed index; candidate pairs are skinny ids; WindowGroupLimit
  * keeps per-query heaps of k.
  *
  * Invariant (spec-asserted, oracle-replayed): because assignment is
  * per-vector independent, base-build + delta-upsert lands EXACTLY the
  * rows a from-scratch assignment of the merged corpus would — the
  * upsert is semantically free.
  */
object IvfIndex {

  /** (vec_id, cell) assignment of `emb` against explicit centroids —
    * the index build for a base corpus AND the upsert for a delta (the
    * caller picks the slice; the math is identical). Broadcast
    * centroids, map-side-combined argmax: the corpus never shuffles.
    */
  def assignCells(emb: DataFrame, cents: DataFrame): DataFrame =
    SimSearch.clusterAssignWithCentroids(emb, cents)
      .select(col("vec_id"), col("cluster_id").as("cell"))

  /** Probe + exact re-rank top-k over an EXPLICIT (landed, possibly
    * upserted) cell table: queries rank the broadcast centroids, probe
    * their `probes` nearest cells, and the probed candidates re-rank
    * exactly under the usual (round-6 sim DESC, cid ASC) total order.
    */
  def topKOverCells(emb: DataFrame, cells: DataFrame, cents: DataFrame,
      queryBound: Int, k: Int, probes: Int): DataFrame = {
    val ndot = graft.functions.DotProduct.fn(emb.sparkSession)
    val vecs = emb.select(col("vec_id"), col("embedding").as("v"),
      sqrt(ndot(col("embedding"), col("embedding"))).as("n"))
    val queries = vecs.filter(col("vec_id") < queryBound)
    val csim = round(ndot(col("v"), col("cv")) / (col("n") * col("cn")), 6)
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cent_id").asc)
    val probed = queries.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cent_id"), csim.as("csim"))
      .withColumn("crn", row_number().over(w))
      .filter(col("crn") <= probes)
      .select(col("vec_id").as("qid"), col("cent_id").as("cell"))
    // Multi-probe duplicates collapse BEFORE the exact re-rank (a
    // duplicated pair would otherwise occupy two ranks).
    val cand = broadcast(probed)
      .join(cells.select(col("vec_id").as("cid"), col("cell")), "cell")
      .filter(col("qid") =!= col("cid"))
      .select("qid", "cid").distinct()
    val w2 = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid").asc)
    cand
      .join(broadcast(queries.select(col("vec_id").as("qid"),
        col("v").as("qv"), col("n").as("qn"))), "qid")
      .join(vecs.select(col("vec_id").as("cid"),
        col("v").as("cv"), col("n").as("cn")), "cid")
      .select(col("qid"), col("cid"),
        round(ndot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6).as("sim"))
      .withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
  }

  /** Per-cell population of a (possibly upserted) cell table, split by
    * an "arrived late" predicate — the index-HEALTH monitor that closes
    * the maintenance loop: upserts never rebalance cells (centroids
    * are frozen), so delta mass concentrating in few cells is the
    * operational signal to retrain. Cell-keyed count aggregate with
    * map-side combine; output is K rows regardless of corpus size.
    */
  def cellStats(cells: DataFrame, isDelta: org.apache.spark.sql.Column): DataFrame =
    cells.groupBy(col("cell"))
      .agg(sum(when(isDelta, 0L).otherwise(1L)).as("n_base"),
        sum(when(isDelta, 1L).otherwise(0L)).as("n_delta"),
        count(lit(1)).as("n_total"))

  /** Config-declared retrain policy (`similarity: retrain_when:`),
    * integer-exact so the decision hash-compares across engines:
    * retrain when ANY cell's delta share exceeds `maxDeltaPct` percent
    * (`n_delta·100 > n_total·pct` — upserts never rebalance frozen
    * cells, so concentrated delta mass means the centroids no longer
    * describe the corpus) OR when cell populations are imbalanced
    * beyond `maxCellRatio` (`max(n_total) > ratio·min(n_total)` —
    * degenerate cells make probe cost skew-bound).
    */
  final case class RetrainPolicy(maxDeltaPct: Int = 50, maxCellRatio: Int = 8) {
    require(maxDeltaPct >= 0 && maxDeltaPct <= 100,
      s"max_delta_pct must be 0..100, got $maxDeltaPct")
    require(maxCellRatio >= 1, s"max_cell_ratio must be >= 1, got $maxCellRatio")
  }

  /** One-row retrain decision over a [[cellStats]] frame — the DRY-RUN
    * form of the maintenance loop (`cfg`-reachable): corpus-wide
    * base/delta totals, the two integer-exact breach flags, and the
    * verdict. K-row input, 1-row output. Every aggregate coalesces, so
    * an EMPTY stats frame (an index with no published cells) yields a
    * clean `retrain = false` no-op row instead of NULL flags that a
    * `getBoolean` caller would trip over.
    */
  def retrainSignal(stats: DataFrame, policy: RetrainPolicy): DataFrame =
    stats.agg(
        count(lit(1)).as("n_cells"),
        coalesce(sum(col("n_base")), lit(0L)).as("base_total"),
        coalesce(sum(col("n_delta")), lit(0L)).as("delta_total"),
        coalesce(
          max(when(col("n_delta") * 100 > col("n_total") * policy.maxDeltaPct,
            1L).otherwise(0L)) === 1, lit(false)).as("delta_breach"),
        coalesce(
          max(col("n_total")) >
            lit(policy.maxCellRatio.toLong) * min(col("n_total")),
          lit(false)).as("ratio_breach"))
      .withColumn("retrain", col("delta_breach") || col("ratio_breach"))

  /** DuckDB twin of [[retrainSignal]] over the upsert fixture: the
    * cell-stats replay reduced to the same one-row integer decision.
    */
  def retrainSignalOracleSql(iters: Int, dim: Int, policy: RetrainPolicy): String =
    s"""WITH stats AS (
       |${cellStatsOracleSql(iters, dim)}
       |)
       |SELECT CAST(count(*) AS BIGINT) AS n_cells,
       |  CAST(coalesce(sum(n_base), 0) AS BIGINT) AS base_total,
       |  CAST(coalesce(sum(n_delta), 0) AS BIGINT) AS delta_total,
       |  coalesce(max(CASE WHEN n_delta * 100 > n_total * ${policy.maxDeltaPct}
       |      THEN 1 ELSE 0 END) = 1, FALSE) AS delta_breach,
       |  coalesce(max(n_total) > ${policy.maxCellRatio} * min(n_total),
       |      FALSE) AS ratio_breach,
       |  coalesce(max(CASE WHEN n_delta * 100 > n_total * ${policy.maxDeltaPct}
       |      THEN 1 ELSE 0 END) = 1, FALSE)
       |    OR coalesce(max(n_total) > ${policy.maxCellRatio} * min(n_total),
       |      FALSE) AS retrain
       |FROM stats""".stripMargin

  // ------------------------------------------------------------------
  // Versioned landed index + the closed maintenance loop
  // ------------------------------------------------------------------

  /** Name of the per-version trained-at watermark file: the max vec_id
    * the version's training SAW, written beside its frames so
    * [[maintainIndexAuto]] can rebase "delta" after every retrain
    * without the caller re-deriving a predicate (re-checking with a
    * stale predicate re-counts the same rows as delta and retrains on
    * every tick — the retrain-storm failure mode).
    */
  val WatermarkName = "_TRAINED_MAX_ID"

  /** Land (centroids, cells) as `indexDir/v=<version>/{centroids,cells}`
    * and atomically re-point `_CURRENT` ([[graft.sink.AtomicPointer]] —
    * the WarehousePublisher commit pattern). One pointer covers BOTH
    * frames, so a serving reader can never pair new centroids with old
    * cells. Retention keeps the two newest versions for in-flight
    * readers. `trainedWatermark` (the max vec_id training saw) lands in
    * the version dir BEFORE the pointer swap, so it is atomic with the
    * frames it describes.
    */
  def publishIndex(cents: DataFrame, cells: DataFrame, indexDir: String,
      version: Long, trainedWatermark: Option[Long] = None): Unit = {
    val spark = cents.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    cents.write.mode("overwrite").parquet(s"$indexDir/v=$version/centroids")
    cells.write.mode("overwrite").parquet(s"$indexDir/v=$version/cells")
    trainedWatermark.foreach { w =>
      graft.sink.AtomicPointer.write(
        conf, s"$indexDir/v=$version", w.toString, name = WatermarkName)
    }
    graft.sink.AtomicPointer.write(conf, indexDir, s"v=$version")
    val dir = new org.apache.hadoop.fs.Path(indexDir)
    val fs = dir.getFileSystem(conf)
    fs.listStatus(dir).map(_.getPath).flatMap { p =>
      val n = p.getName
      if (n.startsWith("v=")) scala.util.Try(n.drop(2).toLong).toOption.map(_ -> p)
      else None
    }.sortBy(-_._1).drop(2).foreach { case (_, p) => fs.delete(p, true) }
  }

  /** The published version `_CURRENT` points at, if any. */
  def currentIndexVersion(spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Option[Long] =
    graft.sink.AtomicPointer.read(
        spark.sparkContext.hadoopConfiguration, indexDir)
      .map(_.stripPrefix("v=").toLong)

  /** (centroids, cells) of the currently-published index version. */
  def readCurrentIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String): (DataFrame, DataFrame) = {
    val v = currentIndexVersion(spark, indexDir).getOrElse(
      throw new IllegalStateException(
        s"$indexDir has no _CURRENT pointer — no index version published"))
    (spark.read.parquet(s"$indexDir/v=$v/centroids"),
      spark.read.parquet(s"$indexDir/v=$v/cells"))
  }

  /** The trained-at watermark of the currently-published version, if
    * that version recorded one ([[publishIndex]]; pre-watermark indexes
    * return None).
    */
  def trainedWatermarkOf(spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Option[Long] =
    currentIndexVersion(spark, indexDir).flatMap { v =>
      graft.sink.AtomicPointer.read(
          spark.sparkContext.hadoopConfiguration,
          s"$indexDir/v=$v", name = WatermarkName)
        .map(_.toLong)
    }

  /** The closed maintenance loop: check the published index's cell
    * stats against the policy; if breached, retrain centroids on the
    * CURRENT corpus, rebuild the cell table, and atomically publish the
    * next version — otherwise leave the current version serving.
    * Returns true iff a retrain was performed. The check is K-row work.
    *
    * The retrain ACT trains through
    * [[SimSearch.trainCentroidsLockedSampled]] at the corpus-size-
    * derived stride ([[SimSearch.IvfParams.trainStrideFor]]) — stride 1
    * below the sample target, where the sampled path coincides with the
    * full locked build (spec-asserted), so small-corpus maintenance
    * lands exactly the from-scratch index; above it the training sample
    * stays pinned at [[SimSearch.IvfParams.TrainSampleTarget]] and a
    * policy-triggered retrain costs the stride curve (~×1.8-1.9 per
    * data decade, TrainProbe) instead of the full build's ~N^1.5 —
    * routine maintenance, not a cluster-stalling event. The cell
    * REBUILD is one map-only broadcast-argmax pass over the corpus
    * ([[assignCells]] — every vector's cell changes when centroids do,
    * so one full pass is the floor).
    *
    * CONTRACT — rebasing `isDelta`: the predicate describes what is
    * delta RELATIVE TO the index being checked. After a true return the
    * published version was trained on the full current corpus, so the
    * caller must rebase (typically to "rows newer than this corpus")
    * before the next tick — re-checking with the stale predicate counts
    * the same rows as delta forever and retrains on every tick. The
    * publish records the trained-at watermark (max vec_id) so
    * [[maintainIndexAuto]] can do that rebase for you; prefer it when
    * vec_ids are monotone in arrival order.
    */
  def maintainIndex(emb: DataFrame, isDelta: org.apache.spark.sql.Column,
      numCentroids: Int, iters: Int, indexDir: String,
      policy: RetrainPolicy): Boolean =
    maintainIndexImpl(emb, isDelta, numCentroids, iters, indexDir, policy,
      strideOverride = None)

  /** [[maintainIndex]] with the derived stride overridable — a spec
    * seam only (fixture corpora sit below the sample target, so the
    * derived stride is always 1 there; the override lets a spec drive
    * the act through a genuinely sampled train and pin its output).
    */
  private[graft] def maintainIndexImpl(emb: DataFrame,
      isDelta: org.apache.spark.sql.Column, numCentroids: Int, iters: Int,
      indexDir: String, policy: RetrainPolicy,
      strideOverride: Option[Int]): Boolean = {
    val (_, cells) = readCurrentIndex(emb.sparkSession, indexDir)
    maintainIndexOverImpl(emb, cells, isDelta, numCentroids, iters, indexDir,
      policy, strideOverride)
  }

  /** The maintenance loop over an EXPLICIT monitored cell table — the
    * streaming shape ([[graft.stream.StreamIvfUpsert]]): upserted delta
    * assignments accumulate OUTSIDE the published version (per-batch
    * partitions), so the health check must run over published ∪
    * not-yet-published rows while the versioned publish still goes
    * through `indexDir`. Also serves bootstrap: with no published
    * version yet, a breach publishes v=0.
    */
  def maintainIndexOver(emb: DataFrame, cells: DataFrame,
      isDelta: org.apache.spark.sql.Column, numCentroids: Int, iters: Int,
      indexDir: String, policy: RetrainPolicy): Boolean =
    maintainIndexOverImpl(emb, cells, isDelta, numCentroids, iters, indexDir,
      policy, strideOverride = None)

  private[graft] def maintainIndexOverImpl(emb: DataFrame, cells: DataFrame,
      isDelta: org.apache.spark.sql.Column, numCentroids: Int, iters: Int,
      indexDir: String, policy: RetrainPolicy,
      strideOverride: Option[Int]): Boolean = {
    val spark = emb.sparkSession
    val retrain = retrainSignal(cellStats(cells, isDelta), policy)
      .select(col("retrain")).head.getBoolean(0)
    if (retrain) {
      // Corpus size + max id in ONE skinny job, paid only on breach —
      // the no-op path stays K-row work.
      val hint = emb.agg(count(lit(1)), max(col("vec_id"))).head
      val n = hint.getLong(0)
      // Possible via maintainIndexOver, where the monitored cells are
      // decoupled from emb: a breach with nothing to train on must
      // name the condition, not die on a null max / bad-stride require.
      require(n > 0L, s"retrain fired with an EMPTY corpus: the policy " +
        s"breached at $indexDir but the emb frame has no rows - pass the " +
        "corpus the monitored cells were assigned from")
      // trainStrideFor's clamp (stride ≤ n/k) guarantees fill only for
      // DENSE 0..n-1 ids; with sparse or structured ids (all-even,
      // snowflake-style) the residue-0 class can hold far fewer than
      // n/stride rows and trip the trainer's underfill require,
      // aborting the maintenance tick. Probe the ACTUAL class sizes of
      // EVERY halving candidate in one skinny aggregate (r17: the
      // per-candidate limit(k).count() loop was up to log₂(stride)
      // driver-sequenced jobs; one conditional-count pass replaces
      // them all) and keep the first candidate that fills — the same
      // stride the loop converged to. An explicit strideOverride stays
      // raw: hand-picked strides keep the fail-fast.
      val stride = strideOverride.getOrElse {
        val s0 = SimSearch.IvfParams.trainStrideFor(n, numCentroids)
        val candidates = Iterator.iterate(s0)(_ / 2).takeWhile(_ > 1).toSeq
        if (candidates.isEmpty) 1
        else {
          val counts = emb.agg(
            count(when(col("vec_id") % candidates.head === 0, 1)).as("c0"),
            candidates.tail.map(s =>
              count(when(col("vec_id") % s === 0, 1)).as(s"c$s")): _*).head
          candidates.zipWithIndex
            .collectFirst { case (s, i) if counts.getLong(i) >= numCentroids => s }
            .getOrElse(1)
        }
      }
      val cents = SimSearch.trainCentroidsLockedSampled(
          emb, numCentroids, iters, stride)
        .localCheckpoint()
      val v = currentIndexVersion(spark, indexDir).getOrElse(-1L) + 1
      publishIndex(cents, assignCells(emb, cents), indexDir, v,
        trainedWatermark = Some(hint.getLong(1)))
    }
    retrain
  }

  /** [[maintainIndex]] with the delta predicate DERIVED from the
    * published version's trained-at watermark: rows with
    * `vec_id > watermark` arrived after that version trained. Because
    * every retrain re-publishes the watermark it trained at, repeated
    * ticks converge — the tick after a retrain sees an empty delta and
    * no-ops (no retrain storm), with no caller-side predicate swap.
    * A version with no recorded watermark (pre-watermark publish)
    * treats the whole corpus as base: only the ratio breach can fire
    * until the first watermarked publish, the storm-safe default.
    */
  def maintainIndexAuto(emb: DataFrame, numCentroids: Int, iters: Int,
      indexDir: String, policy: RetrainPolicy): Boolean = {
    val isDelta = trainedWatermarkOf(emb.sparkSession, indexDir)
      .map(w => col("vec_id") > w).getOrElse(lit(false))
    maintainIndex(emb, isDelta, numCentroids, iters, indexDir, policy)
  }

  /** The upsert fixture's base/delta split rule as SQL: the first 80%
    * of vec_ids are the base corpus, the rest arrive later. Integer
    * floor division matches Scala's `4L * n / 5` exactly.
    *
    * DENSE-ID ASSUMPTION (fixture contract, repo-wide): vec_ids are
    * 0..n-1 with no gaps — the same contract every `queryBound` usage
    * in [[SimSearch]] rests on ("the first `queryBound` ids are the
    * queries"). Under it, `vec_id < 4·count(*)/5` selects exactly the
    * Scala side's `cutoff = 4·n/5` corpus-size hint, so query and
    * oracle derive identical index geometry
    * ([[SimSearch.IvfParams.forCorpus]]). A sparse-id corpus would
    * break the equivalence silently; [[graft.Tables]] fixtures are
    * dense by generation, and `AnnEvalSpec` asserts density on the
    * embeddings fixture so a regenerated fixture cannot drift.
    */
  val BaseWhereSql = "vec_id < (SELECT 4 * count(*) // 5 FROM embeddings)"

  /** DuckDB twin of the landed-upsert serving query: training replays
    * over the BASE slice only ([[SimSearch.trainedCentroidCtesWhere]]),
    * assignment/probe/re-rank over the full corpus — exactly what
    * base-build + delta-upsert + [[topKOverCells]] computes.
    */
  def upsertOracleSql(queryBound: Int, k: Int, iters: Int, dim: Int): String =
    s"""WITH ${SimSearch.trainedCentroidCtesWhere(iters, dim, BaseWhereSql)},
       |r AS (SELECT d.vec_id, cent_id,
       |        row_number() OVER (PARTITION BY d.vec_id
       |          ORDER BY round(list_cosine_similarity(d.v, cu), 6) DESC, cent_id) AS crn
       |      FROM d CROSS JOIN c$iters),
       |cell AS (SELECT vec_id AS cid, cent_id AS cell FROM r WHERE crn = 1),
       |probe AS (SELECT vec_id AS qid, cent_id AS cell FROM r
       |          WHERE crn <= (SELECT greatest(least(10, k), k // 16) FROM kk)
       |            AND vec_id < $queryBound),
       |cand AS (SELECT DISTINCT qid, cid
       |         FROM probe JOIN cell ON probe.cell = cell.cell AND qid <> cid),
       |p AS (SELECT qid, cid, round(list_cosine_similarity(qv.v, cv2.v), 6) AS sim
       |      FROM cand JOIN d qv ON qv.vec_id = qid JOIN d cv2 ON cv2.vec_id = cid),
       |rr AS (SELECT qid, cid, sim,
       |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC) AS rn
       |       FROM p)
       |SELECT qid, cid, sim, CAST(rn AS INT) AS rank FROM rr WHERE rn <= $k""".stripMargin

  /** DuckDB twin of [[cellStats]] over the upsert fixture's merged
    * index: base-only training replay, full assignment, per-cell
    * base/delta/total counts.
    */
  def cellStatsOracleSql(iters: Int, dim: Int): String =
    s"""WITH ${SimSearch.trainedCentroidCtesWhere(iters, dim, BaseWhereSql)},
       |r AS (SELECT d.vec_id, cent_id,
       |        row_number() OVER (PARTITION BY d.vec_id
       |          ORDER BY round(list_cosine_similarity(d.v, cu), 6) DESC, cent_id) AS crn
       |      FROM d CROSS JOIN c$iters),
       |cell AS (SELECT vec_id AS cid, cent_id AS cell FROM r WHERE crn = 1)
       |SELECT cell,
       |  CAST(sum(CASE WHEN $BaseWhereSqlCid THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
       |  CAST(sum(CASE WHEN $BaseWhereSqlCid THEN 0 ELSE 1 END) AS BIGINT) AS n_delta,
       |  CAST(count(*) AS BIGINT) AS n_total
       |FROM cell GROUP BY cell""".stripMargin

  /** [[BaseWhereSql]] phrased over the cell table's `cid` column. */
  private val BaseWhereSqlCid =
    "cid < (SELECT 4 * count(*) // 5 FROM embeddings)"
}
