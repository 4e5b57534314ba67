package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting and resampling over hashed n-gram
  * features — the published data-selection move (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * score every raw document by how much more likely its n-grams are
  * under a TARGET distribution (a high-quality subset or a separate
  * trusted corpus) than under the raw corpus, then keep documents with
  * probability proportional to that importance ratio. The selection
  * signal is distributional (which token transitions the document
  * uses), orthogonal to the per-document heuristics in
  * [[TextAnalysis]] (length/stopword gates) and to the dedup family —
  * it is the "make the 100 TB crawl look like the curated corpus"
  * stage of a pretraining pipeline.
  *
  * Exact-arithmetic adaptation (house rule: no float accumulations
  * whose summation order an engine could permute): the paper's weight
  * is a sum of per-feature log-probability ratios — a float fold whose
  * result is partition-order-sensitive. Here the per-document masses
  * are INTEGER sums — t_mass = Σ target-count(b), r_mass =
  * Σ raw-count(b) over the document's bigram instances — and the
  * importance ratio is ONE terminal division of exact BIGINT products:
  *
  *   ratio = (t_mass / N_t) / (r_mass / N_r)
  *         = (t_mass · N_r) / (r_mass · N_t)
  *
  * i.e. the ratio of ARITHMETIC-mean feature frequencies under the two
  * distributions, where the paper uses the geometric mean (sum of
  * logs). Both are monotone in "target-ness" of the document's feature
  * mass; the arithmetic form is engine-exact, so the DuckDB oracle
  * reproduces every weight bit-for-bit. r_mass ≥ n_bigrams ≥ 1 by
  * construction (every bigram counts itself), so the division is
  * always defined when the target is non-empty.
  *
  * Resampling is the same integer-bucket gate as
  * [[TextAnalysis.temperatureMix]]: document kept iff
  *
  *   bucket(id) · r_mass · N_t  <  keepNum · t_mass · N_r
  *
  * with bucket the md5-derived value in [0,100) — P(keep) ≈
  * min(1, keepNum/100 · ratio), the paper's importance resampling with
  * a deterministic uniform variate. Integer products only; the BIGINT
  * headroom bound is r_mass · N_t < 2⁶³/100 ≈ 9·10¹⁶ — holds to
  * ~10¹²-bigram corpora with per-doc masses ≤ 10⁵ (the measured sf10
  * fixture peaks at ~10¹⁴); past that, gate on the rounded ratio
  * instead and accept last-ulp ties.
  *
  * Scale shape (100 TB): bigram hashing is map-only (8-byte xxhash64
  * values; text never shuffles); the per-feature count table is a
  * two-phase hash aggregate bounded by VOCABULARY, not the token
  * stream; one shingle-keyed exchange feeds both the count aggregate
  * and the per-doc attach join (AQE reuses it — the [[TextAnalysis.bigramFit]]
  * shape); the totals are a broadcast 1-row frame; the resample gate
  * is a map-only integer comparison. Optional `buckets` folds the
  * feature space to a fixed width (the paper's 10k-bucket hashing) —
  * the count table then carries AT MOST `buckets` rows regardless of
  * vocabulary, the knob for corpora whose bigram vocabulary itself
  * strains the exchange.
  */
object Dsir {

  /** Per-document masses with corpus totals attached:
    * (id, n_bigrams, t_mass, r_mass, __NR, __NT). `isTarget` is any
    * boolean Column over the input's columns — a quality gate, a
    * source-label membership, a join-produced flag.
    */
  private def massFrame(
      docs: DataFrame, idCol: String, textCol: String, isTarget: Column,
      buckets: Option[Int]): DataFrame = {
    // Same Project barrier as bigramFit: the lambda must reference the
    // token array as an ATTRIBUTE, or element_at re-runs the split per
    // element (O(n²) per document, measured 12 s at sf0.1 there).
    val toks = split(trim(col(textCol)), "\\s+")
    val rawBg = transform(sequence(lit(0), size(col("__toks")) - 2),
      i => xxhash64(concat_ws(" ",
        element_at(col("__toks"), i + 1), element_at(col("__toks"), i + 2))))
    val bg = buckets match {
      case None    => rawBg
      case Some(b) => transform(rawBg, h => pmod(h, lit(b.toLong)))
    }
    val inst = docs
      .select(col(idCol), isTarget.as("__is_t"), toks.as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(col(idCol), col("__is_t"), explode(bg).as("h"))
    val counts = inst.groupBy(col("h")).agg(
      count(lit(1)).as("n_r"),
      sum(when(col("__is_t"), 1L).otherwise(0L)).as("n_t"))
    val totals = counts.agg(
      sum(col("n_r")).as("__NR"), sum(col("n_t")).as("__NT"))
    inst.join(counts, "h")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("n_t")).as("t_mass"), sum(col("n_r")).as("r_mass"))
      .crossJoin(broadcast(totals))
  }

  /** Per-document DSIR importance weights: bigram count, target and
    * raw feature masses, and the importance ratio
    * (t_mass·N_r)/(r_mass·N_t) rounded to 6 places. Documents with
    * fewer than 2 tokens have no bigram features and are absent (no
    * distributional evidence either way). Precondition: at least one
    * target document (N_t = 0 leaves no distribution to match).
    */
  def weights(
      docs: DataFrame, idCol: String, textCol: String, isTarget: Column,
      buckets: Option[Int] = None): DataFrame =
    massFrame(docs, idCol, textCol, isTarget, buckets)
      .select(col(idCol), col("n_bigrams"), col("t_mass"), col("r_mass"),
        round((col("t_mass") * col("__NR")).cast("double") /
          (col("r_mass") * col("__NT")), 6).as("dsir_ratio"))

  /** Importance-resampled corpus: input rows kept iff
    * bucket(id)·r_mass·N_t < keepNum·t_mass·N_r — P(keep) ≈
    * min(1, keepNum/100 · ratio). Keeps the input's own columns
    * (composes like the other keep-rule samplers); sub-2-token
    * documents drop (no features ⇒ no importance evidence).
    */
  def sample(
      docs: DataFrame, idCol: String, textCol: String, isTarget: Column,
      keepNum: Int = 25, buckets: Option[Int] = None): DataFrame = {
    require(keepNum >= 1 && keepNum <= 100, s"keepNum in [1,100], got $keepNum")
    val bucket = pmod(TextAnalysis.tokenHash(col(idCol).cast("string")), lit(100L))
    docs.join(massFrame(docs, idCol, textCol, isTarget, buckets), idCol)
      .filter(bucket * col("r_mass") * col("__NT") <
        lit(keepNum.toLong) * col("t_mass") * col("__NR"))
      .select(docs.columns.map(col): _*)
  }

  /** Shared oracle CTE prefix: bigram instances with the target flag,
    * per-bigram counts, corpus totals, per-doc masses. `isTargetSql`
    * may reference `ws` (the token list) and the table's own columns.
    * DuckDB sums promote to HUGEINT — every mass is CAST back to
    * BIGINT before the products so the strict gate's type audit sees
    * BIGINT/DOUBLE only, exactly like the engine side.
    */
  private def oracleCtes(
      table: String, idCol: String, textCol: String, isTargetSql: String): String =
    s"""tok0 AS (SELECT *,
       |    string_split_regex(trim($textCol), '\\s+') AS ws FROM $table),
       |tok AS (SELECT *, ($isTargetSql) AS is_t FROM tok0),
       |bg AS (SELECT $idCol, is_t,
       |    unnest([ws[i] || ' ' || ws[i+1] FOR i IN range(1, len(ws))]) AS b
       |  FROM tok WHERE len(ws) >= 2),
       |c AS (SELECT b, CAST(count(*) AS BIGINT) AS n_r,
       |    CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS n_t
       |  FROM bg GROUP BY 1),
       |tot AS (SELECT CAST(sum(n_r) AS BIGINT) AS nr_tot,
       |    CAST(sum(n_t) AS BIGINT) AS nt_tot FROM c),
       |m AS (SELECT $idCol, count(*) AS n_bigrams,
       |    CAST(sum(n_t) AS BIGINT) AS t_mass, CAST(sum(n_r) AS BIGINT) AS r_mass
       |  FROM bg JOIN c USING (b) GROUP BY 1)""".stripMargin

  /** DuckDB twin of [[weights]] (unbucketed: bigram strings stand in
    * for their hashes, the Jaccard-family convention).
    */
  def weightsOracleSql(
      table: String, idCol: String, textCol: String, isTargetSql: String): String =
    s"""WITH ${oracleCtes(table, idCol, textCol, isTargetSql)}
       |SELECT $idCol, n_bigrams, t_mass, r_mass,
       |  round(CAST(t_mass * nr_tot AS DOUBLE) / (r_mass * nt_tot), 6)
       |    AS dsir_ratio
       |FROM m, tot""".stripMargin

  /** DuckDB twin of [[sample]]; `cols` pins the output schema. */
  def sampleOracleSql(
      table: String, idCol: String, textCol: String, isTargetSql: String,
      keepNum: Int, cols: Seq[String]): String = {
    val bkt = s"(('0x' || substr(md5(CAST(d.$idCol AS VARCHAR)), 1, 15))::BIGINT % 100)"
    s"""WITH ${oracleCtes(table, idCol, textCol, isTargetSql)}
       |SELECT ${cols.map("d." + _).mkString(", ")}
       |FROM $table d JOIN m USING ($idCol), tot
       |WHERE $bkt * r_mass * nt_tot < $keepNum * t_mass * nr_tot""".stripMargin
  }
}
