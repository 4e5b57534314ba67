package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The Gopher / MassiveText quality-rule battery (Rae et al. 2021,
  * table A1; reused by FineWeb and most open curation pipelines) —
  * the document-level heuristics applied BEFORE any model-based
  * filter: word-count bounds, mean-word-length bounds, symbol-to-word
  * ratio, alphabetic-word fraction, and a minimum stopword count.
  * The repetition rules of the same paper live in `rep_ratio`
  * (duplicate line/paragraph/n-gram fractions); this battery is the
  * complementary map-only half, so the two queries together cover the
  * published rule set.
  *
  * Every ratio rule is evaluated in EXACT INTEGERS (cross-multiplied
  * thresholds), so a pass/fail can never flip on a float rounding
  * between engines; the mean word length is exported as the scaled
  * integer (10^6 · chars) div words for the same reason.
  *
  * The fixture corpus has no newlines, so the paper's line-shaped
  * rules (bullet-line and ellipsis-line fractions) have no line
  * structure to count; the ellipsis/symbol signal is kept as the
  * symbol-to-word ratio over '#' and '...' occurrences — the same
  * symbols the paper names — and the line rules are a segmentation
  * parameter away if a corpus carries newlines.
  *
  * Scale: one codegen'd map-only projection over the corpus — no
  * exchange at all; the quality columns land next to the document for
  * the downstream gate to consume.
  */
object GopherRules {

  private val Stopwords = TextAnalysis.QualityStopwords

  def battery(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = coalesce(col(textCol), lit(""))
    val toks = split(trim(text), "\\s+")
    val base = docs.select(col(idCol), toks.as("__toks"), text.as("__text"))

    val nWords = size(col("__toks")).cast("long")
    val nChars = aggregate(col("__toks"), lit(0L),
      (acc, w) => acc + length(w))
    val nAlpha = size(filter(col("__toks"),
      w => w.rlike("[A-Za-z]"))).cast("long")
    val nStop = size(filter(col("__toks"),
      w => w.isInCollection(Stopwords))).cast("long")
    val hashes = (length(col("__text")) -
      length(expr("replace(__text, '#', '')"))).cast("long")
    val ellipses = expr(
      "(length(__text) - length(replace(__text, '...', ''))) div 3")
    val nSymbols = hashes + ellipses

    base.select(
        col(idCol),
        nWords.as("n_words"),
        nChars.as("n_chars"),
        nAlpha.as("n_alpha_words"),
        nStop.as("n_stop"),
        nSymbols.as("n_symbols"))
      .withColumn("mean_len_x1e6",
        expr("(1000000 * n_chars) div n_words"))
      .withColumn("passes",
        col("n_words") >= 50 && col("n_words") <= 100000 &&
        col("mean_len_x1e6") >= 3000000L && col("mean_len_x1e6") <= 10000000L &&
        // symbol-to-word ratio < 0.1  <=>  10*symbols < words
        col("n_symbols") * 10 < col("n_words") &&
        // alphabetic-word fraction > 0.8  <=>  10*alpha > 8*words
        col("n_alpha_words") * 10 > col("n_words") * 8 &&
        col("n_stop") >= 2)
  }

  /** DuckDB twin: same tokenization, same integer cross-multiplied
    * thresholds, list lambdas in place of the Catalyst ones.
    */
  def oracleSql(table: String, idCol: String, textCol: String): String = {
    val stopList = Stopwords.map(w => s"'$w'").mkString(",")
    s"""WITH w AS (
       |  SELECT $idCol, coalesce($textCol, '') AS t,
       |    string_split_regex(trim(coalesce($textCol, '')), '\\s+') AS ws
       |  FROM $table),
       |m AS (
       |  SELECT $idCol,
       |    CAST(len(ws) AS BIGINT) AS n_words,
       |    CAST(list_sum(list_transform(ws, x -> length(x))) AS BIGINT)
       |      AS n_chars,
       |    CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))
       |      AS BIGINT) AS n_alpha_words,
       |    CAST(len(list_filter(ws, x -> x IN ($stopList))) AS BIGINT)
       |      AS n_stop,
       |    CAST(length(t) - length(replace(t, '#', ''))
       |      + (length(t) - length(replace(t, '...', ''))) // 3 AS BIGINT)
       |      AS n_symbols
       |  FROM w)
       |SELECT $idCol, n_words, n_chars, n_alpha_words, n_stop, n_symbols,
       |  (1000000 * n_chars) // n_words AS mean_len_x1e6,
       |  (n_words >= 50 AND n_words <= 100000
       |   AND (1000000 * n_chars) // n_words BETWEEN 3000000 AND 10000000
       |   AND n_symbols * 10 < n_words
       |   AND n_alpha_words * 10 > n_words * 8
       |   AND n_stop >= 2) AS passes
       |FROM m""".stripMargin
  }
}
