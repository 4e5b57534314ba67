package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The C4 cleaning-rule battery (Raffel et al. 2020, "Exploring the
  * Limits of Transfer Learning", §2.2 — the heuristics that built the
  * Colossal Clean Crawled Corpus). Complements [[GopherRules]]: where
  * Gopher filters on word-shape statistics, C4 filters on LINE shape
  * and page-level content flags:
  *
  *   - keep only lines that end in a terminal punctuation mark
  *     (`.` `!` `?` `"`),
  *   - keep only lines with at least 5 words,
  *   - drop any line containing the word "javascript",
  *   - drop pages containing "lorem ipsum",
  *   - drop pages containing a curly brace `{`,
  *   - drop pages containing any word from a blocklist (the paper uses
  *     the "List of Dirty, Naughty …" words; the list content is
  *     deployment config, so it is a parameter here),
  *   - drop pages whose RETAINED text has fewer than 3 sentences.
  *
  * (The paper's remaining rule — three-sentence span dedup — is the
  * existing `span_dedup` operator; this battery is the map-only
  * filter half.)
  *
  * Sentences are counted as terminal-punctuation characters (`.!?`)
  * in the kept lines — the same proxy the reference implementations
  * use before a real sentence splitter, and exactly replayable in SQL.
  * All counts are exact integers; `passes` can never flip on a float
  * rounding between engines.
  *
  * Scale: one codegen'd map-only projection over the corpus — no
  * exchange at all; the audit columns land next to the document for
  * the downstream gate to consume, like the Gopher battery.
  */
object C4Rules {

  /** Terminal punctuation that ends a retained line (Raffel et al.
    * §2.2 names the period, exclamation mark, question mark, and end
    * quotation mark).
    */
  val TerminalPunct: Seq[String] = Seq(".", "!", "?", "\"")

  def battery(docs: DataFrame, idCol: String, textCol: String,
              blocklist: Seq[String]): DataFrame = {
    require(blocklist.nonEmpty, "c4 blocklist must not be empty")
    val text = coalesce(col(textCol), lit(""))
    // Trimmed, non-empty lines of the page ('\r?\n' like GopherRules —
    // CRLF corpora must segment identically in both engines).
    val ls = filter(transform(split(text, "\\r?\\n"), l => trim(l)),
      l => length(l) > 0)
    val base = docs.select(col(idCol), ls.as("__lines"), text.as("__text"))

    val isJs = (l: Column) => lower(l).contains("javascript")
    val endsTerm = (l: Column) =>
      TerminalPunct.map(p => l.endsWith(p)).reduce(_ || _)
    val wordCount = (l: Column) => size(split(l, "\\s+"))
    val isKept = (l: Column) => wordCount(l) >= 5 && endsTerm(l) && !isJs(l)

    val nLines = size(col("__lines")).cast("long")
    val nJs = size(filter(col("__lines"), isJs)).cast("long")
    val kept = filter(col("__lines"), isKept)
    val nKept = size(kept).cast("long")
    // Sentence proxy: count of '.', '!', '?' characters in kept lines.
    val nSentences = aggregate(kept, lit(0L),
      (acc, l) => acc + (length(l) - length(translate(l, ".!?", ""))))

    val toks = split(trim(lower(col("__text"))), "\\s+")
    val hasBlockword = exists(toks, w => w.isInCollection(blocklist))

    base.select(
        col(idCol),
        nLines.as("n_lines"),
        nKept.as("n_kept"),
        nJs.as("n_js_lines"),
        nSentences.as("n_sentences"),
        lower(col("__text")).contains("lorem ipsum").as("has_lorem"),
        col("__text").contains("{").as("has_brace"),
        hasBlockword.as("has_blockword"))
      .withColumn("passes",
        col("n_sentences") >= 3 &&
        !col("has_lorem") && !col("has_brace") && !col("has_blockword"))
  }

  /** DuckDB twin of [[battery]]; `linedCte` must define a CTE named
    * `c4lined(idCol, t2)` supplying the newline-bearing text (the
    * fixture corpus carries no newlines — same pattern as the Gopher
    * line rules).
    */
  def oracleSql(linedCte: String, idCol: String,
                blocklist: Seq[String]): String = {
    val termSql = TerminalPunct
      .map(p => s"ends_with(x, '${if (p == "'") "''" else p}')")
      .mkString(" OR ")
    val blockSql = blocklist.map(w => s"'$w'").mkString(",")
    val keptCond = s"len(string_split_regex(x, '\\s+')) >= 5 " +
      s"AND ($termSql) AND NOT contains(lower(x), 'javascript')"
    s"""WITH $linedCte,
       |l AS (SELECT $idCol, t2,
       |    list_filter(list_transform(string_split_regex(t2, '\r?\n'),
       |      x -> trim(x)), x -> length(x) > 0) AS ls
       |  FROM c4lined),
       |m AS (SELECT $idCol, t2, ls,
       |    list_filter(ls, x -> $keptCond) AS kept
       |  FROM l),
       |a AS (SELECT $idCol,
       |    CAST(len(ls) AS BIGINT) AS n_lines,
       |    CAST(len(kept) AS BIGINT) AS n_kept,
       |    CAST(len(list_filter(ls, x -> contains(lower(x), 'javascript')))
       |      AS BIGINT) AS n_js_lines,
       |    CAST(coalesce(list_sum(list_transform(kept,
       |      x -> length(x) - length(translate(x, '.!?', '')))), 0)
       |      AS BIGINT) AS n_sentences,
       |    contains(lower(t2), 'lorem ipsum') AS has_lorem,
       |    contains(t2, '{') AS has_brace,
       |    len(list_filter(string_split_regex(trim(lower(t2)), '\\s+'),
       |      x -> x IN ($blockSql))) > 0 AS has_blockword
       |  FROM m)
       |SELECT $idCol, n_lines, n_kept, n_js_lines, n_sentences,
       |  has_lorem, has_brace, has_blockword,
       |  (n_sentences >= 3 AND NOT has_lorem AND NOT has_brace
       |   AND NOT has_blockword) AS passes
       |FROM a""".stripMargin
  }
}
