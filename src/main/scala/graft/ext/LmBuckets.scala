package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CCNet-style language-model quality bucketing (Wenzek et al. 2020):
  * score every document by its cross-entropy under a reference bigram
  * LM (CCNet trains KenLM on Wikipedia; here the reference is any
  * caller-supplied boolean column — the curation quality gate by
  * default, so "reference" and "quality" can never diverge), then cut
  * each language into equal head / middle / tail terciles by score —
  * the head third is the most reference-like and the standard CCNet
  * move is to train on head+middle and drop or downweight tail.
  *
  * Integer-exact cross-entropy: the per-bigram code length is computed
  * in WHOLE BITS as bitlen(c(w1) + V) - bitlen(c(w1 w2) + 1) — the
  * bit-length (floor log2 + 1) of the add-one-smoothed bigram
  * probability's reciprocal. A float ln/log2 differs in the last ulp
  * between libm implementations, which a hash-compared oracle cannot
  * tolerate (the same reason tfidf keeps its ratio un-logged); the
  * bit-length form is the integer-exact stand-in, and per-document
  * averaging over hundreds of bigrams recovers sub-bit resolution.
  * The per-document score is the scaled integer mean
  * (10^6 · Σ bits) div n_bigrams. Documents with fewer than two tokens
  * have no bigram evidence and are excluded (route them to a length
  * gate — every real curation config already bounds length below 2).
  *
  * Scale shape: reference bigram/prefix counts are vocabulary-bounded
  * aggregates with map-side combine; the corpus bigram stream joins
  * them as fixed-width (hash, count) pairs — document text never
  * shuffles. The per-language tercile rank uses the winsorize
  * two-level prefix-sum (score-bucket offsets + in-bucket row_number),
  * so no language ever becomes a single window partition: bucket
  * order extends (score, id) order, making offset + in-bucket index
  * exactly the global rank.
  */
object LmBuckets {

  private val ScoreBucket = 1048576L // 2^20 sub-buckets of the scaled score

  /** (idCol, langCol, bits_x1e6, bucket) for every document with >= 2
    * tokens; bucket in {head, middle, tail} per language by score
    * tercile (ties broken by id, so the cut is deterministic).
    */
  def buckets(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, isRef: Column): DataFrame = {
    val toks = split(trim(coalesce(col(textCol), lit(""))), "\\s+")
    val base = docs.select(col(idCol).as("__id"), col(langCol).as("__lang"),
      toks.as("__toks"), isRef.as("__ref"))

    // Bigram instances: (doc, lang, ref, prefix-hash, bigram-hash).
    // __toks is an attribute before the lambda (the bigramFit barrier).
    val bgs = transform(sequence(lit(0), size(col("__toks")) - 2),
      i => struct(
        xxhash64(element_at(col("__toks"), i + 1)).as("h1"),
        xxhash64(concat_ws(" ", element_at(col("__toks"), i + 1),
          element_at(col("__toks"), i + 2))).as("hb")))
    val inst = base.filter(size(col("__toks")) >= 2)
      .select(col("__id"), col("__lang"), col("__ref"), explode(bgs).as("bg"))
      .select(col("__id"), col("__lang"), col("__ref"),
        col("bg.h1").as("h1"), col("bg.hb").as("hb"))

    // ONE pass over the reference bigram stream: counts keyed (h1, hb)
    // — the bigram count table with its prefix hash carried along.
    // Both lookup tables derive from it by vocabulary-sized re-aggregation
    // (sum of (h1, hb) counts over hb IS the h1 prefix count, exactly),
    // so the instance stream is scanned and shuffled once, not twice
    // (guide §2.3 "aggregate before you shuffle"; the r16 before-plan had
    // two full instance exchanges and 16 parquet scans).
    val refCounts = inst.filter(col("__ref"))
      .groupBy(col("h1"), col("hb")).agg(count(lit(1)).as("__c"))
    val cb = refCounts.groupBy(col("hb")).agg(sum(col("__c")).as("__cb"))
    val cu = refCounts.groupBy(col("h1")).agg(sum(col("__c")).as("__cu"))
    // Add-one denominator: reference vocabulary size (1-row broadcast).
    val vocab = base.filter(col("__ref"))
      .select(explode(col("__toks")).as("w"))
      .agg(count_distinct(col("w")).as("__v"))

    val bits = length(bin(coalesce(col("__cu"), lit(0L)) + col("__v"))) -
      length(bin(coalesce(col("__cb"), lit(0L)) + lit(1L)))
    val perDoc = inst
      .join(cu, Seq("h1"), "left")
      .join(cb, Seq("hb"), "left")
      .crossJoin(broadcast(vocab))
      .groupBy(col("__id"))
      .agg(first(col("__lang")).as("__lang"),
        sum(bits.cast("long")).as("__s"), count(lit(1)).as("__n"))
      .select(col("__id"), col("__lang"),
        expr("(1000000 * __s) div __n").as("bits_x1e6"))

    // Per-language tercile via the two-level prefix-sum rank.
    val bucketed = perDoc.withColumn("__bucket",
      expr(s"bits_x1e6 div $ScoreBucket"))
    val wIn = Window.partitionBy(col("__lang"), col("__bucket"))
      .orderBy(col("bits_x1e6"), col("__id"))
    val offsets = bucketed.groupBy(col("__lang"), col("__bucket"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(
        Window.partitionBy(col("__lang")).orderBy(col("__bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__tot", sum(col("__cnt")).over(
        Window.partitionBy(col("__lang"))))
      .select(col("__lang"), col("__bucket"), col("__off"), col("__tot"))
    bucketed
      .withColumn("__rn", row_number().over(wIn).cast("long"))
      .join(broadcast(offsets), Seq("__lang", "__bucket"))
      .withColumn("__terc", expr("(3 * (__off + __rn - 1)) div __tot"))
      .select(col("__id").as(idCol), col("__lang").as(langCol),
        col("bits_x1e6"),
        when(col("__terc") === 0, "head")
          .when(col("__terc") === 1, "middle")
          .otherwise("tail").as("bucket"))
  }

  /** DuckDB twin: bigram/prefix STRINGS in place of the hashes, a
    * single-window per-language rank in place of the two-level sum
    * (bucket order extends (score, id) order, so they agree exactly),
    * BIGINT casts before the scaled mean (DuckDB sum() is HUGEINT).
    * `refWhere` is a predicate over the token list `ws`.
    */
  def oracleSql(table: String, idCol: String, textCol: String,
      langCol: String, refWhere: String): String =
    s"""WITH d AS (
       |  SELECT $idCol AS id, $langCol AS lang,
       |    string_split_regex(trim(coalesce($textCol, '')), '\\s+') AS ws
       |  FROM $table),
       |dr AS (SELECT id, lang, ws, ($refWhere) AS ref FROM d),
       |v AS (
       |  SELECT count(DISTINCT w) AS v
       |  FROM (SELECT unnest(ws) AS w FROM dr WHERE ref)),
       |bg AS (
       |  SELECT id, lang, ref,
       |    unnest([ws[i] FOR i IN range(1, len(ws))]) AS w1,
       |    unnest([ws[i] || ' ' || ws[i+1] FOR i IN range(1, len(ws))]) AS b
       |  FROM dr WHERE len(ws) >= 2),
       |cb AS (SELECT b, count(*) AS cb FROM bg WHERE ref GROUP BY 1),
       |cu AS (SELECT w1, count(*) AS cu FROM bg WHERE ref GROUP BY 1),
       |cost AS (
       |  SELECT bg.id, bg.lang,
       |    length(bin(CAST(coalesce(cu.cu, 0) + (SELECT v FROM v) AS BIGINT)))
       |      - length(bin(CAST(coalesce(cb.cb, 0) + 1 AS BIGINT))) AS c
       |  FROM bg LEFT JOIN cu USING (w1) LEFT JOIN cb USING (b)),
       |per AS (
       |  SELECT id, any_value(lang) AS lang,
       |    (1000000 * CAST(sum(c) AS BIGINT)) // count(*) AS bits
       |  FROM cost GROUP BY id),
       |rk AS (
       |  SELECT id, lang, bits,
       |    row_number() OVER (PARTITION BY lang ORDER BY bits, id) - 1 AS r,
       |    count(*) OVER (PARTITION BY lang) AS n
       |  FROM per)
       |SELECT id AS $idCol, lang AS $langCol,
       |  CAST(bits AS BIGINT) AS bits_x1e6,
       |  CASE (3 * r) // n WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
       |    ELSE 'tail' END AS bucket
       |FROM rk""".stripMargin
}
