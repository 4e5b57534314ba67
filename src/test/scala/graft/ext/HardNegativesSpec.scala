package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** DPR-style hard-negative mining. */
class HardNegativesSpec extends SparkTestBase {
  import spark.implicits._

  test("negatives always carry a different label; nearest one ranks first") {
    // anchor 0 (label 0) at [1,0]; same-label 10 is closest but
    // ineligible; different-label 20 (close) must outrank 21 (far).
    val emb = Seq(
      (0L, 0, Seq(1f, 0f)),
      (10L, 0, Seq(0.99f, 0.01f)),
      (20L, 1, Seq(0.9f, 0.3f)),
      (21L, 1, Seq(0.1f, 0.9f)))
      .toDF("vec_id", "label", "embedding")
    val out = HardNegatives.mine(emb, 1, 2)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("cid")).toSeq === Seq(20L, 21L))
    assert(out.forall(_.getAs[Int]("clabel") == 1))
  }

  test("fixture: every negative's label differs from its anchor's") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val anchors = emb.select(col("vec_id").as("qid"), col("label").as("qlabel"))
    val joined = HardNegatives.mine(emb, 64, 5)
      .join(anchors, "qid")
    assert(joined.filter(col("clabel") === col("qlabel")).count() === 0L)
    // every anchor gets exactly k rows with ranks 1..k
    val perQ = joined.groupBy("qid")
      .agg(count(lit(1)).as("n"), max("rank").as("hi")).collect()
    assert(perQ.nonEmpty)
    perQ.foreach { r =>
      assert(r.getAs[Long]("n") === 5L && r.getAs[Int]("hi") === 5)
    }
  }
}
