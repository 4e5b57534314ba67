package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML/boilerplate stripping — the EXTRACTION step that precedes
  * every published cleaning battery: C4 (Raffel et al. 2020), Gopher
  * (Rae et al. 2021) and CCNet all operate on text already extracted
  * from markup, so a corpus arriving as raw HTML needs this pass
  * before `ext/C4Rules` / `ext/GopherRules` can see real words. The
  * reference pipeline lands raw API/file payloads without content
  * extraction (`/root/reference/README.md` processing flow); this is
  * part of the beyond-reference LLM-curation surface.
  *
  * Scope (deliberate): tag-level extraction — `<script>`/`<style>`
  * blocks dropped WITH their content (code is not prose), remaining
  * tags replaced by spaces (block boundaries must not glue words
  * together), the six ubiquitous HTML entities decoded (`&amp;` LAST,
  * so `&amp;lt;` decodes to the literal `&lt;` exactly once — the
  * standard single-pass rule). Full DOM fidelity (nesting repair,
  * readability scoring) is a parser's job, not an engine primitive;
  * the three-regex form is what runs over 100 TB because it is one
  * map-only codegen'd projection with no exchange.
  *
  * Cross-engine exactness: RE2 (DuckDB) has no backreferences, so the
  * block patterns name their closing tag explicitly instead of `\1`;
  * non-greedy `.*?`, inline `(?is)` flags, `\b` and the entity
  * alternation behave identically in RE2 and Java regex on this
  * grammar. Entity decoding uses LITERAL replace (no regex) in both
  * engines, applied in one shared order.
  */
object HtmlStrip {

  /** `<script ...> ... </script>` with content, case-insensitive,
    * dot-matches-newline. Explicit closing tag: RE2 lacks `\1`.
    */
  val ScriptPat = "(?is)<script\\b[^>]*>.*?</script\\s*>"
  val StylePat = "(?is)<style\\b[^>]*>.*?</style\\s*>"

  /** Any remaining tag. An unclosed block tag degrades to this rule in
    * both engines (the non-greedy block pattern simply never matches).
    */
  val TagPat = "<[^>]*>"

  /** Decode order is part of the contract: `&amp;` strictly last. */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  private val EntityPat = "&(amp|lt|gt|quot|#39|nbsp);"

  /** Extraction + audit columns: the cleaned text plus exact integer
    * counts of what was removed (script/style blocks, tags stripped by
    * the final pass, entities decoded) — the columns a curation run
    * lands next to the document to explain WHY a page shrank.
    */
  def strip(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val raw = coalesce(col(textCol), lit(""))
    val noBlocks = regexp_replace(regexp_replace(raw, ScriptPat, " "),
      StylePat, " ")
    val noTags = regexp_replace(noBlocks, TagPat, " ")
    val decoded = Entities.foldLeft(noTags) { case (c, (e, r)) =>
      replace(c, lit(e), lit(r))
    }
    docs.select(col(idCol),
      decoded.as("clean_text"),
      (regexp_count(raw, lit(ScriptPat)) +
        regexp_count(raw, lit(StylePat))).cast("long").as("n_blocks"),
      regexp_count(noBlocks, lit(TagPat)).cast("long").as("n_tags"),
      regexp_count(noTags, lit(EntityPat)).cast("long").as("n_entities"))
  }

  /** DuckDB twin over a text expression (`textSql`, e.g. a derived
    * injection lane); identical regex grammar and decode order.
    */
  def oracleSql(table: String, idCol: String, textSql: String): String = {
    val decoded = Entities.foldLeft("no_tags") { case (c, (e, r)) =>
      val rq = if (r == "'") "''" else r
      s"replace($c, '$e', '$rq')"
    }
    s"""WITH src AS (SELECT $idCol, coalesce($textSql, '') AS raw FROM $table),
       |nb AS (SELECT $idCol, raw,
       |  regexp_replace(regexp_replace(raw,
       |    '(?is)<script\\b[^>]*>.*?</script\\s*>', ' ', 'g'),
       |    '(?is)<style\\b[^>]*>.*?</style\\s*>', ' ', 'g') AS no_blocks
       |  FROM src),
       |nt AS (SELECT $idCol, raw, no_blocks,
       |  regexp_replace(no_blocks, '<[^>]*>', ' ', 'g') AS no_tags FROM nb)
       |SELECT $idCol, $decoded AS clean_text,
       |  CAST(len(regexp_extract_all(raw, '(?is)<script\\b[^>]*>.*?</script\\s*>'))
       |    + len(regexp_extract_all(raw, '(?is)<style\\b[^>]*>.*?</style\\s*>'))
       |    AS BIGINT) AS n_blocks,
       |  CAST(len(regexp_extract_all(no_blocks, '<[^>]*>')) AS BIGINT) AS n_tags,
       |  CAST(len(regexp_extract_all(no_tags, '&(amp|lt|gt|quot|#39|nbsp);'))
       |    AS BIGINT) AS n_entities
       |FROM nt""".stripMargin
  }
}
