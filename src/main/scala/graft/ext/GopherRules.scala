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
  * The paper's line-shaped rules (bullet-line and ellipsis-line
  * fractions) live in [[lineRules]] over newline-segmented text; the
  * fixture corpus carries no newlines, so its `gopher_rules_lines`
  * query derives a deterministic newline-bearing lane from the token
  * stream (oracle-replayed) rather than editing the fixture. The
  * ellipsis/symbol signal additionally stays in this battery as the
  * symbol-to-word ratio over '#' and '...' occurrences — the same
  * symbols the paper names.
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

  /** Bullet markers the line rule recognizes (Rae et al. table A1
    * names bullet points; these are the common plain-text forms).
    */
  val BulletMarkers: Seq[String] = Seq("- ", "* ", "• ")

  /** The LINE-shaped Gopher rules (Rae et al. table A1): at most 90%
    * of lines may start with a bullet marker and at most 30% may end
    * with an ellipsis. Lines are the '\n' segmentation of `textCol`
    * (empty lines dropped); thresholds are exact-integer
    * cross-multiplications like the word battery. Map-only projection,
    * no exchange.
    */
  def lineRules(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // \r?\n, not '\n': CRLF corpora would otherwise leave a trailing
    // '\r' on every line, so endsWith("...") never fires (the oracle
    // twin splits the same way — both engines must agree on Windows
    // text, not just on the fixture).
    val ls = filter(split(coalesce(col(textCol), lit("")), "\\r?\\n"),
      l => length(l) > 0)
    val base = docs.select(col(idCol), ls.as("__lines"))
    val isBullet = (l: Column) =>
      BulletMarkers.map(m => l.startsWith(m)).reduce(_ || _)
    base.select(
        col(idCol),
        size(col("__lines")).cast("long").as("n_lines"),
        size(filter(col("__lines"), isBullet)).cast("long").as("n_bullet"),
        size(filter(col("__lines"), l => l.endsWith("...")))
          .cast("long").as("n_ellipsis"))
      .withColumn("passes_lines",
        // bullet-line fraction <= 0.9 <=> 10*bullets <= 9*lines
        col("n_bullet") * 10 <= col("n_lines") * 9 &&
        // ellipsis-line fraction <= 0.3 <=> 10*ellipses <= 3*lines
        col("n_ellipsis") * 10 <= col("n_lines") * 3)
  }

  /** DuckDB twin of [[lineRules]]; `linedCte` must define a CTE named
    * `lined(idCol, t2)` supplying the newline-bearing text.
    */
  def lineRulesOracleSql(linedCte: String, idCol: String): String = {
    val bulletSql = BulletMarkers
      .map(m => s"starts_with(x, '$m')").mkString(" OR ")
    s"""WITH $linedCte,
       |l AS (SELECT $idCol,
       |    list_filter(string_split_regex(t2, '\r?\n'), x -> length(x) > 0) AS ls
       |  FROM lined),
       |m AS (SELECT $idCol,
       |    CAST(len(ls) AS BIGINT) AS n_lines,
       |    CAST(len(list_filter(ls, x -> $bulletSql)) AS BIGINT) AS n_bullet,
       |    CAST(len(list_filter(ls, x -> ends_with(x, '...'))) AS BIGINT)
       |      AS n_ellipsis
       |  FROM l)
       |SELECT $idCol, n_lines, n_bullet, n_ellipsis,
       |  (n_bullet * 10 <= n_lines * 9 AND n_ellipsis * 10 <= n_lines * 3)
       |    AS passes_lines
       |FROM m""".stripMargin
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
