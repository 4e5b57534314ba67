package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Gopher/MassiveText quality-rule battery. */
class GopherRulesSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: (Long, String)*) = {
    val df = rows.toDF("doc_id", "text")
    GopherRules.battery(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  // 60 words, all alphabetic, stopword-rich, mean length in [3,10].
  private val goodText =
    (Seq.fill(12)(Seq("the", "quick", "brown", "fox", "jumps")).flatten)
      .mkString(" ")

  test("a clean document passes every rule") {
    val out = run(1L -> goodText)
    val r = out(1L)
    assert(r.getAs[Long]("n_words") === 60L)
    assert(r.getAs[Boolean]("passes") === true)
  }

  test("word-count bounds: short documents fail") {
    val out = run(1L -> "the quick brown fox jumps")
    assert(out(1L).getAs[Boolean]("passes") === false)
  }

  test("mean word length out of [3,10] fails") {
    // 60 single-char words: mean length 1 < 3.
    val short = Seq.fill(30)(Seq("a", "b")).flatten.mkString(" ")
    val out = run(1L -> short)
    assert(out(1L).getAs[Long]("mean_len_x1e6") === 1000000L)
    assert(out(1L).getAs[Boolean]("passes") === false)
  }

  test("symbol-to-word ratio: hashes and ellipses counted exactly") {
    val noisy = goodText + " " + Seq.fill(7)("#tag#").mkString(" ")
    val out = run(1L -> noisy)
    // 7 words of "#tag#" contribute 14 hashes over 67 words: 140 >= 67.
    assert(out(1L).getAs[Long]("n_symbols") === 14L)
    assert(out(1L).getAs[Boolean]("passes") === false)
    val dots = run(2L -> (goodText + " wait... no... more..."))
    assert(dots(2L).getAs[Long]("n_symbols") === 3L)
  }

  test("alphabetic-word fraction below 0.8 fails") {
    // 60 good words + 20 pure-number words -> 60/80 = 0.75 <= 0.8.
    val numeric = goodText + " " + (1 to 20).map(_ => "12345").mkString(" ")
    val out = run(1L -> numeric)
    assert(out(1L).getAs[Long]("n_alpha_words") === 60L)
    assert(out(1L).getAs[Long]("n_words") === 80L)
    assert(out(1L).getAs[Boolean]("passes") === false)
  }

  test("stopword floor: a stopword-free document fails") {
    val noStop = Seq.fill(60)("lorem").mkString(" ")
    val out = run(1L -> noStop)
    assert(out(1L).getAs[Long]("n_stop") === 0L)
    assert(out(1L).getAs[Boolean]("passes") === false)
  }

  test("fixture run: battery is non-vacuous in both directions") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val out = GopherRules.battery(docs, "doc_id", "text")
    val agg = out.agg(
      sum(when(col("passes"), 1).otherwise(0)).as("p"),
      sum(when(!col("passes"), 1).otherwise(0)).as("f")).collect().head
    assert(agg.getLong(0) > 0L && agg.getLong(1) > 0L)
  }

  private def runLines(rows: (Long, String)*) = {
    val s2 = spark; import s2.implicits._
    GopherRules.lineRules(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
  }

  test("line rules: bullet fraction at the 90% edge (9/10 passes, 10/10 fails)") {
    val nine = ((1 to 9).map(i => s"- item $i") :+ "plain line").mkString("\n")
    val ten = (1 to 10).map(i => s"- item $i").mkString("\n")
    val out = runLines(1L -> nine, 2L -> ten)
    assert(out(1L).getAs[Long]("n_bullet") === 9L)
    assert(out(1L).getAs[Boolean]("passes_lines") === true)
    assert(out(2L).getAs[Long]("n_bullet") === 10L)
    assert(out(2L).getAs[Boolean]("passes_lines") === false)
  }

  test("line rules: ellipsis fraction at the 30% edge (3/10 passes, 4/10 fails)") {
    def doc(nDots: Int) = ((1 to nDots).map(i => s"line $i trails ...") ++
      (nDots + 1 to 10).map(i => s"line $i")).mkString("\n")
    val out = runLines(1L -> doc(3), 2L -> doc(4))
    assert(out(1L).getAs[Long]("n_ellipsis") === 3L)
    assert(out(1L).getAs[Boolean]("passes_lines") === true)
    assert(out(2L).getAs[Long]("n_ellipsis") === 4L)
    assert(out(2L).getAs[Boolean]("passes_lines") === false)
  }

  test("line rules: all bullet markers recognized; empty lines dropped") {
    val mixed = "- dash\n* star\n\u2022 dot\n\n\nplain"
    val out = runLines(1L -> mixed)
    assert(out(1L).getAs[Long]("n_lines") === 4L) // empties dropped
    assert(out(1L).getAs[Long]("n_bullet") === 3L)
  }

  test("line rules: CRLF line endings — ellipsis still detected, no phantom '\\r' lines") {
    // Windows-style text: every line ends "\r\n". Before the \r?\n
    // split, each line kept a trailing '\r' so endsWith("...") never
    // matched and a final "\r\n" produced a phantom "\r" line.
    val crlf = "one trails ...\r\nline 2\r\nline 3\r\nline 4\r\n"
    val out = runLines(1L -> crlf)
    assert(out(1L).getAs[Long]("n_lines") === 4L)
    assert(out(1L).getAs[Long]("n_ellipsis") === 1L)
  }

  test("line rules: empty text yields zero lines and passes vacuously") {
    val out = runLines(1L -> "")
    assert(out(1L).getAs[Long]("n_lines") === 0L)
    assert(out(1L).getAs[Boolean]("passes_lines") === true)
  }

  test("derived fixture lane discriminates BOTH line rules at sf0.001") {
    val lined = graft.queries.NorthStar.linedDocs(spark, sf0001)
    val out = GopherRules.lineRules(lined, "doc_id", "text")
    val agg = out.agg(
      sum(when(col("n_bullet") * 10 > col("n_lines") * 9, 1).otherwise(0)),
      sum(when(col("n_ellipsis") * 10 > col("n_lines") * 3, 1).otherwise(0)),
      sum(when(col("passes_lines"), 1).otherwise(0))).collect().head
    assert(agg.getLong(0) > 0L, "no bullet-rule failures")
    assert(agg.getLong(1) > 0L, "no ellipsis-rule failures")
    assert(agg.getLong(2) > 0L, "no passing docs")
  }
}
