package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Complete Gopher repetition battery (Rae et al. 2021 table A1). */
class GopherRepetitionSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: (Long, String)*) = {
    val df = rows.toDF("doc_id", "text")
    GopherRepetition.battery(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
  }

  test("duplicate lines and paragraphs: occurrences beyond the first") {
    // 4 lines, 'same line' twice -> 1 dup line; its 9 chars dup'd once.
    val text = "same line\nother one\nsame line\nlast row"
    val r = run(1L -> text)(1L)
    assert(r.getAs[Long]("n_lines") === 4L)
    assert(r.getAs[Long]("n_dup_lines") === 1L)
    // line chars: 9+9+9+8 = 35, dup 9 -> (1e6*9) div 35
    assert(r.getAs[Long]("dup_line_char_frac_x1e6") === 1000000L * 9 / 35)
    // one paragraph only (no blank line)
    assert(r.getAs[Long]("n_paras") === 1L)
    assert(r.getAs[Long]("n_dup_paras") === 0L)
  }

  test("duplicate paragraph detected across blank lines") {
    val p = "first line\nsecond line"
    val text = s"$p\n\nmiddle para\n\n$p"
    val r = run(1L -> text)(1L)
    assert(r.getAs[Long]("n_paras") === 3L)
    assert(r.getAs[Long]("n_dup_paras") === 1L)
    // dup lines too: both lines of p recur
    assert(r.getAs[Long]("n_dup_lines") === 2L)
  }

  test("top 2-gram fraction: count times gram chars over total chars") {
    // tokens: b b b c -> 2-grams "b b"x2, "b c"x1; top num = 2*2 = 4;
    // total chars 4 -> frac 1e6.
    val r = run(1L -> "b b b c")(1L)
    assert(r.getAs[Long]("top_2gram_frac_x1e6") === 1000000L)
  }

  test("dup 5-gram coverage counts overlapping positions once") {
    // 'a a a a a a': 5-grams at pos 0,1 are identical (count 2) ->
    // all 6 positions covered -> frac = 1.0.
    val r = run(1L -> "a a a a a a")(1L)
    assert(r.getAs[Long]("dup_5gram_frac_x1e6") === 1000000L)
    // disjoint repeat: 'v w x y z v w x y z' -> the 5-gram 'v w x y z'
    // occurs at pos 0 and 5 -> all 10 positions covered.
    val r2 = run(2L -> "v w x y z v w x y z")(2L)
    assert(r2.getAs[Long]("dup_5gram_frac_x1e6") === 1000000L)
    // no 6-gram repeats in the first doc beyond 'a...': all positions
    // again (6-gram 'a a a a a a' occurs once -> count 1 -> NOT dup).
    assert(r.getAs[Long]("dup_6gram_frac_x1e6") === 0L)
  }

  test("a clean varied document passes every rule") {
    // fully distinct words per line, so no n-gram repeats at all
    val text = (1 to 12).map(i => s"alpha$i beta$i gamma$i delta$i")
      .grouped(3).map(_.mkString("\n")).mkString("\n\n")
    val r = run(1L -> text)(1L)
    assert(r.getAs[Boolean]("passes") === true)
    assert(r.getAs[Long]("n_dup_lines") === 0L)
  }

  test("a boilerplate-heavy document fails") {
    val text = Seq.fill(10)("the same exact line repeated endlessly here")
      .mkString("\n")
    val r = run(1L -> text)(1L)
    assert(r.getAs[Long]("n_dup_lines") === 9L)
    assert(r.getAs[Boolean]("passes") === false)
  }

  test("empty document: zero everything, passes vacuously") {
    val r = run(1L -> "")(1L)
    assert(r.getAs[Long]("total_chars") === 0L)
    assert(r.getAs[Long]("n_lines") === 0L)
    assert(r.getAs[Boolean]("passes") === true)
  }

  test("derived fixture lane discriminates the battery at sf0.001") {
    val out = graft.queries.NorthStar.queries("gopher_repetition")(spark, sf0001)
    val agg = out.agg(
      sum(when(col("passes"), 1).otherwise(0)).as("p"),
      sum(when(!col("passes"), 1).otherwise(0)).as("f"),
      sum(when(col("n_dup_lines") > 0, 1).otherwise(0)).as("dl"),
      sum(when(col("n_dup_paras") > 0, 1).otherwise(0)).as("dp"),
      sum(when(col("dup_5gram_frac_x1e6") > 0, 1).otherwise(0)).as("d5"),
      sum(when(col("dup_10gram_frac_x1e6") > 0, 1).otherwise(0)).as("d10"),
      sum(when(col("top_2gram_frac_x1e6") > 0, 1).otherwise(0)).as("t2"))
      .collect().head
    (0 to 6).foreach { i =>
      assert(agg.getLong(i) > 0L, s"lane audit column $i is vacuous")
    }
  }
}
