package graft.ext

import graft.SparkTestBase

/** Corpus-level duplicate-segment removal: boilerplate strike-out,
  * order-preserving reassembly, no row loss for fully-banned docs,
  * short trailing segments.
  */
class LineDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val boiler = "all rights reserved"

  private def run(docs: Seq[(Long, String)], segWords: Int = 3, minCount: Long = 3) =
    LineDedup.dedupSegments(docs.toDF("doc_id", "text"), "doc_id", "text", segWords, minCount)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap

  test("a segment recurring >= minCount times is struck from every doc") {
    val out = run(Seq(
      1L -> s"alpha beta gamma $boiler",
      2L -> s"$boiler delta echo fox",
      3L -> s"golf hotel india $boiler",
      4L -> "juliet kilo lima mike november oscar"))
    assert(out(1L) == (("alpha beta gamma", 1L, 1L)))
    assert(out(2L) == (("delta echo fox", 1L, 1L)))
    assert(out(3L) == (("golf hotel india", 1L, 1L)))
    assert(out(4L) == (("juliet kilo lima mike november oscar", 2L, 0L)))
  }

  test("a doc that is entirely boilerplate survives with empty text") {
    val out = run(Seq(
      1L -> boiler, 2L -> boiler, 3L -> boiler,
      4L -> s"$boiler papa quebec romeo"))
    assert(out(1L) == (("", 0L, 1L)))
    assert(out(4L) == (("papa quebec romeo", 1L, 1L)))
    assert(out.size == 4)
  }

  test("below-threshold repeats are kept; order is preserved") {
    val out = run(Seq(
      1L -> s"$boiler one two three",
      2L -> s"four five six $boiler")) // only 2 occurrences < 3
    assert(out(1L) == ((s"$boiler one two three", 2L, 0L)))
    assert(out(2L) == ((s"four five six $boiler", 2L, 0L)))
  }

  test("short trailing segment is its own unit") {
    // "tail end" is a 2-word trailing segment shared by 3 docs → banned.
    val out = run(Seq(
      1L -> "a b c tail end",
      2L -> "d e f tail end",
      3L -> "g h i tail end"))
    assert(out(1L) == (("a b c", 1L, 1L)))
    assert(out(3L) == (("g h i", 1L, 1L)))
  }
}
