package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Best-fit sequence packing: validity (no sequence over budget except
  * declared oversize singletons), the packing-efficiency bound,
  * deterministic assignment, and the residual next-fit fold.
  */
class SeqPackFfdSpec extends SparkTestBase {

  private def packed(lens: Seq[Long], budget: Long) = {
    val s = spark; import s.implicits._
    val docs = lens.zipWithIndex.map { case (l, i) => (i.toLong, l) }
      .toDF("doc_id", "n_tokens")
    SeqPack.ffdPack(docs, "doc_id", "n_tokens", budget)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  test("every document lands in exactly one sequence; fills never exceed the budget") {
    val lens = Seq.tabulate(200)(i => (i % 37 + 3).toLong)
    val rows = packed(lens, budget = 64)
    assert(rows.length == 200, "every doc assigned exactly once")
    val fills = rows.groupBy(_._3).view.mapValues(_.map(_._2).sum)
    assert(fills.values.forall(_ <= 64), s"overfull sequence: ${fills.filter(_._2 > 64)}")
  }

  test("utilization meets the bound on a mixed corpus") {
    val lens = Seq.tabulate(300)(i => (i % 29 + 2).toLong)
    val rows = packed(lens, budget = 64)
    val nSeqs = rows.map(_._3).distinct.length
    val util = rows.map(_._2).sum.toDouble / (nSeqs * 64.0)
    assert(util >= 0.80, f"utilization $util%.3f below bound (nSeqs=$nSeqs)")
  }

  test("equal-length classes pack arithmetically: k per sequence, ids dense") {
    // 10 docs of length 20, budget 64 → k=3: sequences of 3,3,3 and a
    // residual 1-doc partial.
    val rows = packed(Seq.fill(10)(20L), budget = 64)
    val bySeq = rows.groupBy(_._3).view.mapValues(_.length).toMap
    assert(bySeq.values.toSeq.sorted == Seq(1, 3, 3, 3))
    assert(bySeq.keySet == Set(0L, 1L, 2L, 3L), s"ids must be dense: ${bySeq.keySet}")
  }

  test("residual partials merge next-fit-decreasing across classes") {
    // Classes: 30×1 (partial 30), 25×1 (partial 25), 8×1 (partial 8);
    // budget 64 → NFD order 30,25,8: 30+25 fits, +8 fits → ONE bin.
    val rows = packed(Seq(30L, 25L, 8L), budget = 64)
    assert(rows.map(_._3).distinct.length == 1)
    assert(rows.map(_._2).sum == 63)
  }

  test("oversize documents get their own declared sequence, never dropped") {
    val rows = packed(Seq(100L, 10L, 10L), budget = 64)
    val over = rows.find(_._2 == 100L).get
    assert(rows.count(_._3 == over._3) == 1, "oversize doc must sit alone")
    assert(rows.length == 3)
  }

  test("assignment is deterministic across runs") {
    val lens = Seq.tabulate(150)(i => (i * 7 % 31 + 2).toLong)
    assert(packed(lens, 64).toSet == packed(lens, 64).toSet)
  }
}
