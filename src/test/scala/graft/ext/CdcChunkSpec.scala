package graft.ext

import graft.SparkTestBase

/** Content-defined chunking: coverage/order invariants and the property
  * that justifies CDC over fixed stride — boundary decisions downstream
  * of an edit are unchanged.
  */
class CdcChunkSpec extends SparkTestBase {
  import spark.implicits._

  private def chunksOf(text: String): Seq[(Long, Long, String)] =
    CdcChunk.chunks(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq

  private val base = (1 to 60).map(i => s"w$i").mkString(" ")

  test("chunks partition the document: word counts sum, ids dense") {
    val cs = chunksOf(base)
    assert(cs.map(_._2).sum == 60)
    assert(cs.map(_._1) == cs.indices.map(_.toLong))
    assert(cs.size > 1, "60 words at modulus 8 should cut at least once")
  }

  test("a short document is a single chunk") {
    val cs = chunksOf("a b c")
    assert(cs == Seq((0L, 3L, cs.head._3)))
  }

  test("shift resistance: a prefix edit leaves the tail chunks' hashes intact") {
    val orig = chunksOf(base)
    val edited = chunksOf(s"INSERTED $base")
    // Fixed-stride chunking would shift EVERY chunk hash. CDC must
    // leave a common suffix of chunk hashes untouched.
    val origH = orig.map(_._3)
    val editH = edited.map(_._3)
    val commonSuffix = origH.reverse.zip(editH.reverse).takeWhile { case (a, b) => a == b }.size
    assert(commonSuffix >= origH.size - 2,
      s"expected all but the head chunk(s) shared, shared=$commonSuffix of ${origH.size}")
    assert(commonSuffix >= 1)
  }

  test("determinism: same text, same chunk table") {
    assert(chunksOf(base) == chunksOf(base))
  }
}
