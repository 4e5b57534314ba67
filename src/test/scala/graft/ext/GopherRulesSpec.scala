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
}
