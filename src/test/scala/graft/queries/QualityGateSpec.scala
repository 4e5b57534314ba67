package graft.queries

import graft.SparkTestBase

/** Adaptive per-stratum quality gate: the cut is per-language, so every
  * language keeps ~its own top fraction — a global absolute threshold
  * would starve strata whose score distribution sits lower.
  */
class QualityGateSpec extends SparkTestBase {

  test("quality_topfrac keeps ~40% of EACH language, not 40% overall") {
    val s = spark
    import s.implicits._
    val totals = graft.Tables.t(s, sf0001, "documents")
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = NorthStar.qualityTopFrac(s, sf0001)
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.keySet == totals.keySet, "no language may be starved out")
    kept.foreach { case (lang, n) =>
      val frac = n.toDouble / totals(lang)
      // percent_rank <= 0.4 keeps floor(0.4*(n-1))+1 rows: ~40% per stratum
      assert(frac > 0.3 && frac < 0.5, s"$lang kept ${"%.2f".format(frac)}")
    }
    // and within each language the kept docs dominate the dropped ones
    val minKept = NorthStar.qualityTopFrac(s, sf0001)
      .groupBy($"lang").agg(org.apache.spark.sql.functions.min($"n_chars").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dropped = graft.Tables.t(s, sf0001, "documents")
      .join(NorthStar.qualityTopFrac(s, sf0001).select("doc_id"), Seq("doc_id"), "left_anti")
    val maxDropped = dropped.groupBy($"lang")
      .agg(org.apache.spark.sql.functions.max($"n_chars").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    maxDropped.foreach { case (lang, mx) =>
      assert(minKept(lang) >= mx,
        s"$lang: kept docs must all score >= every dropped doc")
    }
  }
}
