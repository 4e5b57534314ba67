package graft.ext

import graft.SparkTestBase

/** BPE merge training: hand-checkable corpora pin the argmax order,
  * the deterministic tie-break, canonical greedy application (the
  * repeated-symbol case), exhaustion, and the inference path.
  */
class BpeTrainSpec extends SparkTestBase {

  private def docsOf(texts: String*) = {
    val s = spark; import s.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("learns merges by frequency with deterministic tie-breaks, stops when exhausted") {
    // Words: aa ×2, ab ×1 → pairs: (a,a)=2, (a,b)=1.
    val (merges, vocab) = BpeTrain.learnMerges(
      spark, docsOf("aa aa ab"), "text", numMerges = 10)
    assert(merges.map(m => (m.merge_rank, m.lhs, m.rhs, m.merged, m.pair_n)) ==
      Seq((1L, "a", "a", "aa", 2L), (2L, "a", "b", "ab", 1L)))
    val enc = vocab.collect().map(r => r.getAs[String]("word") -> r.getAs[String]("enc")).toMap
    assert(enc == Map("aa" -> "|aa|", "ab" -> "|ab|"))
  }

  test("greedy application pairs repeated symbols canonically: aaaa -> aa aa") {
    val (merges, vocab) = BpeTrain.learnMerges(
      spark, docsOf("aaaa aaaa aaa"), "text", numMerges = 1)
    // Pairs: aaaa contributes 3 (a,a) each ×2 words, aaa contributes 2 → 8.
    assert(merges == Seq(BpeTrain.Merge(1L, "a", "a", "aa", 8L)))
    val enc = vocab.collect().map(r => r.getAs[String]("word") -> r.getAs[String]("enc")).toMap
    assert(enc("aaaa") == "|aa||aa|", "shared-delimiter encodings would give |aa||a||a|")
    assert(enc("aaa") == "|aa||a|")
  }

  test("tie at equal counts breaks by (lhs, rhs) binary order") {
    // zz and yy both appear once: counts tie at 1; (y,y) < (z,z).
    val (merges, _) = BpeTrain.learnMerges(spark, docsOf("zz yy"), "text", numMerges = 1)
    assert(merges.head.lhs == "y" && merges.head.rhs == "y")
  }

  test("segmentWords applies a learned table to new text map-only") {
    val (merges, _) = BpeTrain.learnMerges(
      spark, docsOf("lower lower lowest"), "text", numMerges = 3)
    val seg = BpeTrain.segmentWords(docsOf("lower lowly"), "doc_id", "text", merges)
    assert(!seg.queryExecution.executedPlan.toString.contains("Exchange"))
    val rows = seg.collect().map(r =>
      (r.getAs[String]("word"), r.getAs[String]("enc"), r.getAs[Long]("n_pieces"))).toSet
    // 3 merges from {lower×2, lowest}: (l,o)=3 → lo; (lo,w)=3 → low;
    // (low,e)=3 → lowe. So lower = [lowe, r], lowly = [low, l, y].
    assert(merges.map(_.merged) == Seq("lo", "low", "lowe"))
    assert(rows.contains(("lower", "|lowe||r|", 2L)))
    assert(rows.contains(("lowly", "|low||l||y|", 3L)))
  }
}
