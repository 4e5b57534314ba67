package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** MMR diverse re-ranking (Carbonell & Goldstein 1998). */
class MmrRerankSpec extends SparkTestBase {
  import spark.implicits._

  test("diversity beats redundancy: rank 2 skips the near-duplicate") {
    // Query 0 = [1,0,0]. Candidate 10 is the best match; candidate 11
    // is near-identical to 10 (rel(11) > rel(12), but sim(11,10) ≈ 1
    // makes its marginal score negative), so MMR's rank 2 goes to the
    // diverse candidate 12 (score ≈ 0.7071 − 0.7028 > 0).
    val emb = Seq(
      (0L, Seq(1f, 0f, 0f)),
      (10L, Seq(0.9f, 0.1f, 0f)),
      (11L, Seq(0.9f, 0.1f, 0.001f)),
      (12L, Seq(0.7f, 0f, 0.7f)))
      .toDF("vec_id", "embedding")
    val out = MmrRerank.rerank(emb, 1, 3, 3)
      .collect().map(r => r.getAs[Int]("rank") -> r.getAs[Long]("cid")).toMap
    assert(out(1) === 10L)
    assert(out(2) === 12L) // not 11, despite rel(11) > rel(12)
    assert(out(3) === 11L)
  }

  test("rank 1 equals the plain relevance argmax; scores carry penalties") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val out = MmrRerank.rerank(emb, 8, 10, 3).cache()
    val top1 = SimSearch.bruteTopKN(emb, 8, 1)
      .select("qid", "cid").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.filter(col("rank") === 1).collect().foreach { r =>
      assert(top1(r.getAs[Long]("qid")) === r.getAs[Long]("cid"))
    }
    // every query yields exactly k distinct candidates with ranks 1..k
    val perQ = out.groupBy("qid")
      .agg(countDistinct("cid").as("nc"), count(lit(1)).as("n"),
        min("rank").as("lo"), max("rank").as("hi")).collect()
    perQ.foreach { r =>
      assert(r.getAs[Long]("nc") === 3L && r.getAs[Long]("n") === 3L)
      assert(r.getAs[Int]("lo") === 1 && r.getAs[Int]("hi") === 3)
    }
    out.unpersist()
  }

  test("filtered MMR: every pick eligible; always-true predicate is identity") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val eligible = emb.filter(col("label") === 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val filtered = MmrRerank.rerank(emb, 8, 10, 3, Some(col("label") === 1))
      .collect()
    assert(filtered.nonEmpty)
    filtered.foreach { r =>
      assert(eligible(r.getAs[Long]("cid")), s"ineligible pick: $r")
    }
    val all = MmrRerank.rerank(emb, 8, 10, 3, Some(lit(true)))
      .collect().map(_.toSeq).toSet
    val plain = MmrRerank.rerank(emb, 8, 10, 3)
      .collect().map(_.toSeq).toSet
    assert(all === plain)
  }

  test("greedy is penalty-consistent: a later pick never beats rank 2's score") {
    // Within a query, scores at ranks >= 2 are non-increasing: each
    // step maximizes over a shrinking remaining set with a growing
    // penalty term.
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val rows = MmrRerank.rerank(emb, 8, 10, 4)
      .filter(col("rank") >= 2).orderBy("qid", "rank")
      .collect().groupBy(_.getAs[Long]("qid"))
    rows.values.foreach { qRows =>
      val scores = qRows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("score"))
      scores.sliding(2).foreach {
        case Array(a, b) => assert(a >= b, s"scores increased: $a -> $b")
        case _ =>
      }
    }
  }
}
