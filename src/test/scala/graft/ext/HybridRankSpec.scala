package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** RRF fusion semantics: the textbook score (Σ 1/(c + rank)), ids
  * missing from one list contribute only the other's term, decimal
  * per-term rounding keeps the fusion associative-exact, and ties
  * break by id.
  */
class HybridRankSpec extends SparkTestBase {
  import spark.implicits._

  private def list(rows: (Long, Int)*) =
    rows.toDF("doc_id", "rank")

  test("two-list fusion: both-present beats single-present; ranks carried") {
    val lex = list(1L -> 1, 2L -> 2, 3L -> 3)
    val vec = list(2L -> 1, 4L -> 2)
    val out = HybridRank.rrfFuse(Seq("lex" -> lex, "vec" -> vec), "doc_id", 10)
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        r.getDouble(3)))
    // doc 2: 1/62 + 1/61 is the only two-term score — must rank first.
    assert(out.head._1 === 2L)
    assert(out.head._4 === BigDecimal(1.0 / 62).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      + BigDecimal(1.0 / 61).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L)._2.contains(1) && byId(1L)._3.isEmpty)
    assert(byId(4L)._2.isEmpty && byId(4L)._3.contains(2))
  }

  test("equal scores tie-break by id ascending") {
    // Same rank in one list each -> identical scores.
    val a = list(5L -> 1)
    val b = list(3L -> 1)
    val out = HybridRank.rrfFuse(Seq("a" -> a, "b" -> b), "doc_id", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(out === Seq(3L, 5L))
  }

  test("k truncates after the fused order; three-list fusion stays exact") {
    val a = list(1L -> 1, 2L -> 2)
    val b = list(2L -> 1, 3L -> 2)
    val c = list(2L -> 3, 1L -> 4)
    val out = HybridRank.rrfFuse(
      Seq("a" -> a, "b" -> b, "c" -> c), "doc_id", 2)
    assert(out.columns.toSeq ===
      Seq("doc_id", "a_rank", "b_rank", "c_rank", "rrf_score"))
    val rows = out.collect()
    assert(rows.length === 2)
    assert(rows.head.getLong(0) === 2L) // three-term score wins
  }

  test("fixture fusion is non-degenerate: both rankers contribute to the top-20") {
    val out = graft.queries.NorthStar.queries("hybrid_rrf")(spark, sf0001)
      .collect()
    assert(out.length === 20)
    val lexOnly = out.count(r => r.get(1) != null && r.get(2) == null)
    val vecOnly = out.count(r => r.get(1) == null && r.get(2) != null)
    val both = out.count(r => r.get(1) != null && r.get(2) != null)
    assert(lexOnly + vecOnly + both === 20)
    assert(out.count(r => r.get(1) != null) > 0, "no lexical contribution")
    assert(out.count(r => r.get(2) != null) > 0, "no dense contribution")
  }
}
