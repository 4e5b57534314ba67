package graft.ext

import graft.SparkTestBase

/** HTML/boilerplate extraction: block drops, tag strips, entity decode. */
class HtmlStripSpec extends SparkTestBase {
  import spark.implicits._

  private def run(texts: (Long, String)*): Map[Long, (String, Long, Long, Long)] =
    HtmlStrip.strip(texts.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap

  test("script/style blocks drop WITH content; other tags become spaces") {
    val out = run(
      (1L, "a <script>var x = 1; if(a<b){go()}</script> b"),
      (2L, "a <STYLE media=\"x\">p{color:red}</STYLE> b"),
      (3L, "<p class=\"x\">para</p> tail"))
    assert(out(1L)._1 === "a   b")
    assert(out(1L)._2 === 1L) // one block
    assert(out(2L)._1 === "a   b") // case-insensitive
    assert(out(3L)._1 === " para  tail")
    assert(out(3L)._3 === 2L) // two tags stripped
  }

  test("unclosed block tag degrades to plain tag stripping") {
    val out = run((1L, "x <script type=\"t\"> no closing y"))
    assert(out(1L)._1 === "x   no closing y")
    assert(out(1L)._2 === 0L) // no complete block matched
    assert(out(1L)._3 === 1L) // the orphan open tag stripped
  }

  test("entity decode: single pass, &amp; last — &amp;lt; yields literal &lt;") {
    val out = run((1L, "a &amp; b &lt;x&gt; &quot;q&quot; &#39;s&#39;&nbsp;! &amp;lt;"))
    assert(out(1L)._1 === "a & b <x> \"q\" 's' ! &lt;")
    assert(out(1L)._4 === 9L) // 8 plain entities + the &amp; of &amp;lt;
  }

  test("null text and markup-free text pass through") {
    val out = run((1L, null), (2L, "plain words only"))
    assert(out(1L) === (("", 0L, 0L, 0L)))
    assert(out(2L) === (("plain words only", 0L, 0L, 0L)))
  }

  test("config html section: min_clean_chars drops markup-only pages;" +
    " floor 0 is the pure transform") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "<p><b></b></p>"),                        // markup-only: 3 spaces after strip
      (2L, "<p>real content that survives</p>"))
      .toDF("doc_id", "text")
    val gated = graft.transform.CurationCompiler.compileHtml(
      graft.config.HtmlConfig(minCleanChars = 10), "doc_id", "text")(docs)
    assert(gated.select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(2L))
    val pure = graft.transform.CurationCompiler.compileHtml(
      graft.config.HtmlConfig(minCleanChars = 0), "doc_id", "text")(docs)
    assert(pure.count() === 2L)
    assert(pure.columns.toSeq ===
      Seq("doc_id", "clean_text", "n_blocks", "n_tags", "n_entities"))
    assert(pure.filter(col("doc_id") === 1L).select("n_tags")
      .collect().head.getLong(0) === 4L)
  }

  test("fixture lane is discriminating: every injection shape occurs") {
    val laned = graft.queries.NorthStar.htmlLanedDocs(spark, sf0001)
    val out = HtmlStrip.strip(laned, "doc_id", "text")
    val agg = out.selectExpr(
      "sum(case when n_blocks > 0 then 1 else 0 end) AS blocks",
      "sum(case when n_tags > 0 then 1 else 0 end) AS tags",
      "sum(case when n_entities > 0 then 1 else 0 end) AS ents",
      "sum(case when n_blocks = 0 and n_tags = 0 and n_entities = 0 then 1 else 0 end) AS clean")
      .collect().head
    assert(agg.getLong(0) > 0 && agg.getLong(1) > 0 &&
      agg.getLong(2) > 0 && agg.getLong(3) > 0)
    // No markup survives into clean_text.
    val leftovers = out.filter("clean_text LIKE '%<p%' OR clean_text LIKE '%script>%'" +
      " OR clean_text LIKE '%&amp;%'").count()
    assert(leftovers === 0L)
  }
}
