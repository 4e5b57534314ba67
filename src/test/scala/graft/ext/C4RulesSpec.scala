package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** C4 cleaning-rule battery (Raffel et al. 2020 §2.2). */
class C4RulesSpec extends SparkTestBase {
  import spark.implicits._

  private val Block = Seq("badterm")

  private def run(rows: (Long, String)*) = {
    val df = rows.toDF("doc_id", "text")
    C4Rules.battery(df, "doc_id", "text", Block)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
  }

  // Five 6-word period-terminated lines: all kept, 5 sentences.
  private val goodPage =
    (1 to 5).map(i => s"this is clean sentence number $i.").mkString("\n")

  test("a clean page passes: all lines kept, sentences counted") {
    val r = run(1L -> goodPage)(1L)
    assert(r.getAs[Long]("n_lines") === 5L)
    assert(r.getAs[Long]("n_kept") === 5L)
    assert(r.getAs[Long]("n_sentences") === 5L)
    assert(r.getAs[Boolean]("passes") === true)
  }

  test("line retention: short lines and unterminated lines dropped") {
    val page = goodPage + "\nshort line.\nthis line has no terminal punct"
    val r = run(1L -> page)(1L)
    assert(r.getAs[Long]("n_lines") === 7L)
    assert(r.getAs[Long]("n_kept") === 5L) // both extras dropped
  }

  test("every terminal punctuation mark retains a line") {
    val page = "a b c d ends with period.\na b c d ends with bang!\n" +
      "a b c d ends with question?\na b c d ends with quote\""
    val r = run(1L -> page)(1L)
    assert(r.getAs[Long]("n_kept") === 4L)
  }

  test("javascript lines dropped and counted, case-insensitively") {
    val page = goodPage + "\nenable JavaScript to view this content."
    val r = run(1L -> page)(1L)
    assert(r.getAs[Long]("n_js_lines") === 1L)
    assert(r.getAs[Long]("n_kept") === 5L) // js line not kept despite shape
  }

  test("sentence floor: 2 sentences fail, 3 pass") {
    def page(n: Int) =
      (1 to n).map(i => s"a clean sentence number $i here.").mkString("\n")
    val out = run(1L -> page(2), 2L -> page(3))
    assert(out(1L).getAs[Long]("n_sentences") === 2L)
    assert(out(1L).getAs[Boolean]("passes") === false)
    assert(out(2L).getAs[Boolean]("passes") === true)
  }

  test("multi-punct kept line contributes every sentence mark") {
    // One kept line with 3 terminal marks inside: passes the floor alone.
    val r = run(1L -> "wait. really? yes, it works here!")(1L)
    assert(r.getAs[Long]("n_kept") === 1L)
    assert(r.getAs[Long]("n_sentences") === 3L)
    assert(r.getAs[Boolean]("passes") === true)
  }

  test("page flags: lorem ipsum (any case), curly brace, blocklist token") {
    val out = run(
      1L -> (goodPage + "\nfiller with Lorem Ipsum inside."),
      2L -> (goodPage + "\nfunction f() { return 1; }"),
      3L -> (goodPage + "\nthis page contains badterm once."),
      4L -> (goodPage + "\nbadterms is a different token."))
    assert(out(1L).getAs[Boolean]("has_lorem") === true)
    assert(out(1L).getAs[Boolean]("passes") === false)
    assert(out(2L).getAs[Boolean]("has_brace") === true)
    assert(out(2L).getAs[Boolean]("passes") === false)
    assert(out(3L).getAs[Boolean]("has_blockword") === true)
    assert(out(3L).getAs[Boolean]("passes") === false)
    // token-exact, not substring: "badterms" does not flag
    assert(out(4L).getAs[Boolean]("has_blockword") === false)
    assert(out(4L).getAs[Boolean]("passes") === true)
  }

  test("empty page: zero lines, zero sentences, fails the floor") {
    val r = run(1L -> "")(1L)
    assert(r.getAs[Long]("n_lines") === 0L)
    assert(r.getAs[Long]("n_sentences") === 0L)
    assert(r.getAs[Boolean]("passes") === false)
  }

  test("CRLF pages segment identically: trailing \\r never hides punct") {
    val crlf = goodPage.split("\n").mkString("\r\n") + "\r\n"
    val r = run(1L -> crlf)(1L)
    assert(r.getAs[Long]("n_lines") === 5L)
    assert(r.getAs[Long]("n_kept") === 5L)
  }

  test("derived fixture lane discriminates every rule at sf0.001") {
    val out = graft.queries.NorthStar.c4RulesQ(spark, sf0001)
    val agg = out.agg(
      sum(when(col("passes"), 1).otherwise(0)).as("p"),
      sum(when(!col("passes"), 1).otherwise(0)).as("f"),
      sum(when(col("has_lorem"), 1).otherwise(0)).as("lorem"),
      sum(when(col("has_brace"), 1).otherwise(0)).as("brace"),
      sum(when(col("has_blockword"), 1).otherwise(0)).as("block"),
      sum(when(col("n_js_lines") > 0, 1).otherwise(0)).as("js"),
      sum(when(col("n_kept") < col("n_lines"), 1).otherwise(0)).as("dropped"),
      sum(when(col("n_sentences") < 3, 1).otherwise(0)).as("thin"))
      .collect().head
    (0 to 7).foreach { i =>
      assert(agg.getLong(i) > 0L, s"column $i of the lane audit is vacuous")
    }
  }
}
