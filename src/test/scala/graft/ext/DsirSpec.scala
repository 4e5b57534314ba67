package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** DSIR importance weights/resampling: hand-computed masses and
  * ratios, featureless-document handling, the keep rule's ratio
  * semantics, and the bucketed feature space's no-information
  * invariant.
  */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  // d1 (target): bigrams "x y"×2, "y x"; d2: "x y", "y z"; d3: "z z";
  // d4 has no bigram. Counts: "x y"(r3,t2) "y x"(r1,t1) "y z"(r1,t0)
  // "z z"(r1,t0); totals NR=6, NT=3.
  private val docs = Seq(
    (1L, "x y x y", true), (2L, "x y z", false),
    (3L, "z z", false), (4L, "solo", false)).toDF("doc_id", "text", "tgt")

  test("weights reproduce hand-computed masses and exact ratios") {
    val w = Dsir.weights(docs, "doc_id", "text", col("tgt"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // d1: t_mass 2+1+2=5, r_mass 3+1+3=7, ratio (5*6)/(7*3)
    assert(w(1L) == ((3L, 5L, 7L, BigDecimal(30.0 / 21)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // d2: t_mass 2, r_mass 4, ratio (2*6)/(4*3) = 1 exactly
    assert(w(2L) == ((2L, 2L, 4L, 1.0)))
    // d3: no target mass at all
    assert(w(3L) == ((1L, 0L, 1L, 0.0)))
  }

  test("a document without bigram features is absent, not zero-scored") {
    val ids = Dsir.weights(docs, "doc_id", "text", col("tgt"))
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L))
  }

  test("keepNum=100 keeps exactly the ratio >= 1 docs regardless of bucket") {
    // bucket <= 99 < 100·ratio for ratio >= 1; ratio 0 never passes.
    val kept = Dsir.sample(docs, "doc_id", "text", col("tgt"), keepNum = 100)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }

  test("sample keeps the input's own columns") {
    val row = Dsir.sample(docs, "doc_id", "text", col("tgt"), keepNum = 100)
      .filter($"doc_id" === 1L).collect().head
    assert(row.schema.fieldNames.toSeq == Seq("doc_id", "text", "tgt"))
    assert(row.getString(1) == "x y x y" && row.getBoolean(2))
  }

  test("a single hash bucket erases all information: every ratio is exactly 1") {
    val ratios = Dsir.weights(docs, "doc_id", "text", col("tgt"),
        buckets = Some(1))
      .select("dsir_ratio").as[Double].collect()
    assert(ratios.length == 3 && ratios.forall(_ == 1.0))
  }

  test("bucketed masses still sum consistently (r_mass >= t_mass >= 0)") {
    val bad = Dsir.weights(docs, "doc_id", "text", col("tgt"), buckets = Some(2))
      .filter($"t_mass" > $"r_mass" || $"t_mass" < 0).count()
    assert(bad == 0L)
  }
}
