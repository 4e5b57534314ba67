package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicated-substring removal — the suffix-array dedup stage of
  * Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
  * Better"), re-expressed as a distributed sliding-window plan: any run
  * of at least `windowLen` tokens that occurs two or more times
  * anywhere in the corpus is removed from every occurrence EXCEPT the
  * canonical first one (minimum (doc, position) order, the same
  * survivor rule as the exact-dedup family).
  *
  * Why sliding windows reproduce the suffix-array semantics: a
  * duplicated run of length M >= windowLen contains exactly
  * M - windowLen + 1 duplicated windows, and their union is the whole
  * run — so marking every non-canonical duplicated window and merging
  * overlapping marks per document recovers the maximal duplicated
  * spans without ever materializing a global suffix order. A
  * suffix array is the single-machine tool for this query; the
  * windowed-hash + interval-merge form is its shuffle-friendly
  * equivalent (the window hash stream is fixed-width and map-side
  * combinable, where suffix-array construction is a global sort).
  *
  * Scale shape: the window stream explodes map-side to (id, pos, hash)
  * — fixed width, never text. One exchange keyed by hash feeds both
  * the frequency count and the duplicate join (AQE reuses the
  * partitioning, the bigramFit pattern). Non-canonical occurrences —
  * by construction only the duplicated fraction of the corpus — flow
  * through one per-document window for interval merging, and the
  * merged spans (one row per maximal duplicated region) broadcast back
  * into the document scan: the corpus text itself is NEVER shuffled.
  * A corpus where the duplicated fraction is itself huge should run
  * whole-document exact dedup first (the operators compose — this
  * stage exists to catch the partial overlaps exact dedup misses).
  *
  * Determinism: token windows are compared by xxhash64 (standing in
  * for string equality exactly as in the Jaccard/shingle family); the
  * canonical-occurrence key packs (doc, pos) into one BIGINT as
  * id * 2^32 + pos, which requires nonnegative doc ids and documents
  * shorter than 2^32 tokens — both asserted trivially true for any
  * real corpus shard.
  */
object SubstrDedup {

  private val PosBase = 4294967296L // 2^32: (id, pos) packed losslessly

  /** 64-bit window key: each token is xxhash64'd ONCE per document,
    * then each window combines its `windowLen` token hashes with a
    * wrapping polynomial (golden-ratio odd multiplier) — `windowLen`
    * long multiply-adds in place of the naive concat_ws + xxhash64,
    * which re-walks ~`windowLen`× the document's characters per
    * position. Measured at sf10 (~200 M windows × 2 plan passes) the
    * two forms are wall-time EQUAL — the explode + partial-aggregate
    * row machinery dominates, not the per-window hash — so this form
    * is kept for its asymptotics (per-window cost independent of token
    * length; long documents and large windows pay the same) rather
    * than a measured win. Collision exposure is unchanged in kind:
    * 64-bit hash-for-string-equality is already the shingle-family
    * convention, and the polynomial over well-mixed token hashes keeps
    * the full 64-bit space (the multiplier is odd, hence invertible
    * mod 2^64 — no entropy loss per step).
    */
  private val HashMul = 0x9E3779B97F4A7C15L

  private def windowKeys(tokenHashes: Column, windowLen: Int): Column =
    transform(
      sequence(lit(0), size(tokenHashes) - windowLen),
      i => struct(i.cast("long").as("pos"),
        aggregate(slice(tokenHashes, i + 1, lit(windowLen)), lit(0L),
          (acc, h) => acc * lit(HashMul) + h).as("h")))

  /** (id, pos-sorted removal occurrences) for every non-canonical
    * duplicated window, merged into maximal spans:
    * (idCol, span_start, span_len) with span_start a 0-based token
    * offset. Internal building block for [[dedup]]; also registered
    * directly — the span table IS the audit artifact a curation run
    * keeps (what was cut, where, how much).
    */
  def spans(docs: DataFrame, idCol: String, textCol: String,
      windowLen: Int): DataFrame = {
    require(windowLen >= 2, s"windowLen must be >= 2, got $windowLen")
    val sp = mergedSpans(docs, idCol, textCol, windowLen)
    sp.select(col("__id").as(idCol),
        col("span_start").cast("long").as("span_start"),
        (col("span_end") - col("span_start")).cast("long").as("span_len"))
  }

  /** Corpus after duplicated-substring removal:
    * (idCol, n_tokens, n_removed, clean_text). Tokenizer-normalized
    * output (single-space joined surviving tokens) — the same
    * convention as [[LineDedup.dedupSegments]]. A fully-duplicated
    * document survives as an empty-text row rather than disappearing.
    */
  def dedup(docs: DataFrame, idCol: String, textCol: String,
      windowLen: Int): DataFrame = {
    require(windowLen >= 2, s"windowLen must be >= 2, got $windowLen")
    val sp = mergedSpans(docs, idCol, textCol, windowLen)
    // One row per doc: sorted (s, e) span list + total removed mass.
    // Small by construction (see scale note above) — broadcast back
    // into the scan so document text never crosses an exchange.
    val spansAgg = sp.groupBy(col("__id"))
      .agg(
        sort_array(collect_list(struct(
          col("span_start").as("s"), col("span_end").as("e")))).as("__sp"),
        sum(col("span_end") - col("span_start")).as("__n_removed"))

    val words = split(trim(coalesce(col(textCol), lit(""))), "\\s+")
    val base = docs.select(col(idCol).as("__id"), words.as("__toks"))
    val spCol = coalesce(col("__sp"),
      array().cast("array<struct<s:bigint,e:bigint>>"))
    val keptPos = filter(
      sequence(lit(0L), size(col("__toks")).cast("long") - 1),
      p => !exists(spCol, s => p >= s("s") && p < s("e")))
    base.join(broadcast(spansAgg), Seq("__id"), "left")
      .select(
        col("__id").as(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        coalesce(col("__n_removed"), lit(0L)).cast("long").as("n_removed"),
        concat_ws(" ", transform(keptPos,
          p => element_at(col("__toks"), (p + 1).cast("int")))).as("clean_text"))
  }

  /** Substring-level eval-set contamination — the PaLM/GPT-family
    * n-gram overlap check, per corpus document: what fraction of the
    * document's sliding `windowLen`-token windows (with multiplicity —
    * a window hit twice counts twice, it is twice the leaked mass)
    * also occurs anywhere in the held-out eval set. The standard
    * decision rule flags a document whose hit fraction reaches 70%
    * (PaLM's published threshold); the comparison is kept in exact
    * integers (10·hits >= 7·windows) so the flag can never flip on a
    * float rounding between engines. Complements [[NearDup
    * .contamination]]: that reports per-(doc, eval) DISTINCT-shingle
    * evidence for audit; this reports the per-document leaked-mass
    * rate the curation cut actually keys on.
    *
    * Scale shape: eval windows reduce to a DISTINCT hash set and
    * broadcast (the eval benchmark is small by definition); the corpus
    * window stream is map-side and meets it in a left-semi broadcast
    * join, so only (id, 1) hit pairs reach the per-document aggregate
    * — corpus text never shuffles, unmatched windows never leave the
    * scan.
    */
  def contaminationRate(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, windowLen: Int): DataFrame = {
    require(windowLen >= 2, s"windowLen must be >= 2, got $windowLen")
    val words = split(trim(coalesce(col(textCol), lit(""))), "\\s+")

    def windowed(df: DataFrame): DataFrame = {
      val base = df.select(col(idCol).as("__id"),
        transform(words, w => xxhash64(w)).as("__th"))
      base.filter(size(col("__th")) >= windowLen)
        .select(col("__id"),
          explode(windowKeys(col("__th"), windowLen)).as("w"))
        .select(col("__id"), col("w.h").as("h"))
    }

    val evalH = windowed(evalSet).select(col("h")).distinct()
    val hits = windowed(corpus)
      .join(broadcast(evalH), Seq("h"), "left_semi")
      .groupBy(col("__id")).agg(count(lit(1)).as("__nh"))
    corpus.select(col(idCol).as("__id"),
        (size(words) - windowLen + 1).cast("long").as("n_windows"))
      .filter(col("n_windows") >= 1)
      .join(hits, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("n_windows"),
        coalesce(col("__nh"), lit(0L)).as("n_hit"),
        round(coalesce(col("__nh"), lit(0L)).cast("double") /
          col("n_windows"), 6).as("hit_frac"),
        (coalesce(col("__nh"), lit(0L)) * 10 >= col("n_windows") * 7)
          .as("contaminated"))
  }

  /** DuckDB twin of [[contaminationRate]]: window STRINGS, the same
    * distinct eval set, the same integer flag rule. `corpusWhere` /
    * `evalWhere` split the table.
    */
  def contaminationRateOracleSql(table: String, idCol: String,
      textCol: String, windowLen: Int, corpusWhere: String,
      evalWhere: String): String =
    s"""WITH w AS (
       |  SELECT $idCol AS id,
       |    string_split_regex(trim(coalesce($textCol, '')), '\\s+') AS ws,
       |    ($corpusWhere) AS is_corpus, ($evalWhere) AS is_eval
       |  FROM $table),
       |cw AS (
       |  SELECT id, ws, CAST(unnest(range(0, len(ws) - $windowLen + 1)) AS BIGINT) AS pos
       |  FROM w WHERE is_corpus AND len(ws) >= $windowLen),
       |cs AS (
       |  SELECT id, array_to_string(ws[pos + 1 : pos + $windowLen], ' ') AS sh
       |  FROM cw),
       |ev AS (
       |  SELECT DISTINCT array_to_string(ws[pos + 1 : pos + $windowLen], ' ') AS sh
       |  FROM (
       |    SELECT ws, CAST(unnest(range(0, len(ws) - $windowLen + 1)) AS BIGINT) AS pos
       |    FROM w WHERE is_eval AND len(ws) >= $windowLen)),
       |hits AS (
       |  SELECT id, CAST(count(*) AS BIGINT) AS nh
       |  FROM cs JOIN ev USING (sh) GROUP BY id)
       |SELECT w.id AS $idCol,
       |  CAST(len(w.ws) - $windowLen + 1 AS BIGINT) AS n_windows,
       |  coalesce(hits.nh, 0) AS n_hit,
       |  round(coalesce(hits.nh, 0)::DOUBLE / (len(w.ws) - $windowLen + 1), 6)
       |    AS hit_frac,
       |  (coalesce(hits.nh, 0) * 10 >= (len(w.ws) - $windowLen + 1) * 7)
       |    AS contaminated
       |FROM w LEFT JOIN hits ON w.id = hits.id
       |WHERE w.is_corpus AND len(w.ws) >= $windowLen""".stripMargin

  /** Maximal removal spans per document: (__id, span_start, span_end),
    * span_end exclusive, 0-based token offsets.
    */
  private def mergedSpans(docs: DataFrame, idCol: String, textCol: String,
      windowLen: Int): DataFrame = {
    val words = split(trim(coalesce(col(textCol), lit(""))), "\\s+")
    // The (id, pos) → id*2^32+pos packing needs integer ids in
    // [0, 2^31); enforce it per row instead of trusting the comment —
    // a violating id raises inside the scan (one comparison per
    // DOCUMENT, off the per-window hot path) rather than silently
    // wrapping the canonical-occurrence order.
    val idL = col(idCol).cast("long")
    val guardedId = when(idL.isNotNull && idL >= 0 && idL < lit(PosBase / 2),
        col(idCol))
      .otherwise(raise_error(concat(
        lit(s"SubstrDedup: $idCol not packable (need integer in [0, 2^31)): "),
        col(idCol).cast("string"))))
    // __th must be an ATTRIBUTE before the window lambda slices it (the
    // bigramFit barrier lesson: slicing a raw expression re-runs it
    // once per window).
    val base = docs.select(guardedId.as("__id"),
      transform(words, w => xxhash64(w)).as("__th"))
    val inst = base
      .filter(size(col("__th")) >= windowLen)
      .select(col("__id"), explode(windowKeys(col("__th"), windowLen)).as("w"))
      .select(col("__id"), col("w.pos").as("pos"), col("w.h").as("h"))
    val enc = col("__id") * lit(PosBase) + col("pos")
    val cnt = inst.groupBy(col("h"))
      .agg(count(lit(1)).as("c"), min(col("__id") * lit(PosBase) + col("pos")).as("canon"))
      .filter(col("c") >= 2)
      .select(col("h"), col("canon"))
    val rem = inst.join(cnt, "h")
      .filter(enc =!= col("canon"))
      .select(col("__id"), col("pos"))
    // Classic island merge: fixed window length means pos order is
    // also end order, so a window starts a new island iff it begins
    // past the previous window's end.
    val w = Window.partitionBy(col("__id")).orderBy(col("pos"))
    rem
      .withColumn("__nf",
        when(lag(col("pos"), 1).over(w).isNull ||
          col("pos") > lag(col("pos"), 1).over(w) + windowLen, 1L)
          .otherwise(0L))
      .withColumn("__island", sum(col("__nf")).over(w))
      .groupBy(col("__id"), col("__island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + windowLen).as("span_end"))
  }

  // ---- DuckDB twins: window STRINGS in place of xxhash64, same
  //      canonical-min packing, same island merge. ----

  private def spanCtes(table: String, idCol: String, textCol: String,
      windowLen: Int): String =
    s"""WITH w AS (
       |  SELECT $idCol AS id,
       |    string_split_regex(trim(coalesce($textCol, '')), '\\s+') AS ws
       |  FROM $table),
       |ip AS (
       |  SELECT id, ws, CAST(unnest(range(0, len(ws) - $windowLen + 1)) AS BIGINT) AS pos
       |  FROM w WHERE len(ws) >= $windowLen),
       |inst AS (
       |  SELECT id, pos,
       |    array_to_string(ws[pos + 1 : pos + $windowLen], ' ') AS sh
       |  FROM ip),
       |cnt AS (
       |  SELECT sh, min(id * $PosBase + pos) AS canon
       |  FROM inst GROUP BY sh HAVING count(*) >= 2),
       |rem AS (
       |  SELECT i.id, i.pos FROM inst i JOIN cnt ON i.sh = cnt.sh
       |  WHERE i.id * $PosBase + i.pos <> cnt.canon),
       |isl AS (
       |  SELECT id, pos,
       |    CASE WHEN lag(pos) OVER (PARTITION BY id ORDER BY pos) IS NULL
       |         OR pos > lag(pos) OVER (PARTITION BY id ORDER BY pos) + $windowLen
       |      THEN 1 ELSE 0 END AS nf
       |  FROM rem),
       |isl2 AS (
       |  SELECT id, pos,
       |    sum(nf) OVER (PARTITION BY id ORDER BY pos) AS island
       |  FROM isl),
       |spans AS (
       |  SELECT id, island, min(pos) AS s, max(pos) + $windowLen AS e
       |  FROM isl2 GROUP BY id, island)""".stripMargin

  def spansOracleSql(table: String, idCol: String, textCol: String,
      windowLen: Int): String =
    spanCtes(table, idCol, textCol, windowLen) + s"""
       |SELECT id AS $idCol, CAST(s AS BIGINT) AS span_start,
       |  CAST(e - s AS BIGINT) AS span_len
       |FROM spans""".stripMargin

  def dedupOracleSql(table: String, idCol: String, textCol: String,
      windowLen: Int): String =
    spanCtes(table, idCol, textCol, windowLen) + s""",
       |rm AS (
       |  SELECT id, CAST(sum(e - s) AS BIGINT) AS n_removed
       |  FROM spans GROUP BY id),
       |tok AS (
       |  SELECT id, ws, CAST(unnest(range(0, len(ws))) AS BIGINT) AS p
       |  FROM w),
       |kept AS (
       |  SELECT t.id, t.p, t.ws[t.p + 1] AS word
       |  FROM tok t LEFT JOIN spans sp
       |    ON t.id = sp.id AND t.p >= sp.s AND t.p < sp.e
       |  WHERE sp.id IS NULL),
       |agg AS (
       |  SELECT id, string_agg(word, ' ' ORDER BY p) AS clean_text
       |  FROM kept GROUP BY id)
       |SELECT w.id AS $idCol, CAST(len(w.ws) AS BIGINT) AS n_tokens,
       |  coalesce(rm.n_removed, 0) AS n_removed,
       |  coalesce(agg.clean_text, '') AS clean_text
       |FROM w LEFT JOIN rm ON w.id = rm.id
       |       LEFT JOIN agg ON w.id = agg.id""".stripMargin
}
