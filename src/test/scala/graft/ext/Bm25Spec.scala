package graft.ext

import graft.SparkTestBase

class Bm25Spec extends SparkTestBase {

  private def bm25(tf: Long, df: Long, dl: Long, n: Long, avgdl: Double): Double = {
    val idf = math.log(1.0 + (n.toDouble - df + 0.5) / (df + 0.5))
    val tfp = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    // Same HALF_UP-at-6-places as Spark's round().
    BigDecimal(idf * tfp).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("scores match the closed-form arithmetic on a hand corpus") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "d")).toDF("doc_id", "text")
    val out = Bm25.topK(docs, "doc_id", "text", Seq("a", "b"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    // N=3, tot=6, avgdl=2.0; df(a)=2, df(b)=1.
    val d1 = BigDecimal(bm25(2, 2, 3, 3, 2.0)) + BigDecimal(bm25(1, 1, 3, 3, 2.0))
    val d2 = BigDecimal(bm25(1, 2, 2, 3, 2.0))
    assert(out.map(_._1) == List(1L, 2L)) // doc 3 matches nothing
    assert(out.map(_._2) == List(2L, 1L)) // terms matched
    assert(out.map(_._3) == List(d1.toDouble, d2.toDouble))
  }

  test("ties rank by doc_id; limit keeps the top k") {
    val s = spark; import s.implicits._
    // Four identical docs → identical scores; top-2 must be the two
    // smallest ids, deterministically.
    val docs = (1L to 4L).map(i => (i, "x y")).toDF("doc_id", "text")
    val out = Bm25.topK(docs, "doc_id", "text", Seq("x"), 2)
      .collect().map(_.getLong(0)).toList
    assert(out == List(1L, 2L))
  }

  test("main job is one corpus scan, no df self-join") {
    val df = graft.Tables.t(spark, sf0001, "documents")
    val q = Bm25.topK(df, "doc_id", "text", Seq("hash", "join"), 10)
    val plan = q.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      s"scoring must scan the corpus once:\n$plan")
    assert(!plan.contains("Join"),
      s"df must arrive as a literal, not a self-join:\n$plan")
    assert(!plan.contains("Exchange"),
      s"scoring is a projection — the job must be shuffle-free:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be heap-based, not a global sort:\n$plan")
  }
}
