package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Structural invariants of [[SimSearch.semanticDedup]] beyond the
  * oracle gate: the survivor set is a dominance fixed point (re-running
  * dedup on survivors drops nothing — every surviving pair is below
  * threshold), every dropped vector has a surviving smaller-id witness
  * is NOT guaranteed (dominance is by any smaller id, dropped or not) —
  * asserted as documented, and a planted duplicate pair loses exactly
  * its larger id.
  */
class SemanticDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def cents(emb: org.apache.spark.sql.DataFrame) =
    SimSearch.trainCentroidsLocked(emb, 4, 1)

  test("planted near-duplicate loses its larger id, distinct vectors survive") {
    // 4 orthogonal-ish base vectors + an exact copy of vec 1 under id 10.
    val rows = Seq(
      0L -> Array(10f, 0f, 0f, 0f),
      1L -> Array(0f, 10f, 0f, 0f),
      2L -> Array(0f, 0f, 10f, 0f),
      3L -> Array(0f, 0f, 0f, 10f),
      10L -> Array(0f, 10.5f, 0f, 0f))
    val emb = rows.toDF("vec_id", "embedding")
    val surv = SimSearch.semanticDedup(emb, 0.9, cents(emb))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(surv === Set(0L, 1L, 2L, 3L), s"got $surv")
  }

  test("quality-weighted variant keeps the best, not the smallest id") {
    // Same geometry as the planted case, but vec 10 (the near-dup of
    // vec 1) carries the HIGHER quality: min-id policy would keep 1,
    // the best-policy must keep 10.
    val rows = Seq(
      (0L, Array(10f, 0f, 0f, 0f), 5),
      (1L, Array(0f, 10f, 0f, 0f), 1),
      (2L, Array(0f, 0f, 10f, 0f), 5),
      (3L, Array(0f, 0f, 0f, 10f), 5),
      (10L, Array(0f, 10.5f, 0f, 0f), 9))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val surv = SimSearch.semanticDedupBest(emb, 0.9,
        cents(emb.select("vec_id", "embedding")), "label")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(surv === Set(0L, 2L, 3L, 10L), s"got $surv")
  }

  test("leakage-safe split never splits a cluster across the eval boundary") {
    val r = graft.queries.NorthStar.splitLeakageSafeQ(spark, sf0001)
    val perCluster = r.groupBy("cluster_id")
      .agg(countDistinct("split").as("n_splits"))
      .agg(max("n_splits")).head().getLong(0)
    assert(perCluster === 1L, "a cluster straddles splits")
    val splits = r.select("split").distinct()
      .collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")) && splits.contains("train"))
  }

  test("cell-scoped near-dup pairs: exactly the same-cell pairs above threshold") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val c = SimSearch.trainCentroidsLocked(emb, 16, 2)
    val got = SimSearch.nearDupPairsCells(emb, 0.4, c)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // Independent reference: assign cells, brute-force every same-cell
    // pair, keep exact cosine >= threshold.
    val cells = SimSearch.clusterAssignWithCentroids(emb, c)
      .select(col("vec_id"), col("cluster_id").as("cell"))
    val v = emb.join(cells, "vec_id")
      .select("vec_id", "embedding", "cell")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray,
        r.getAs[Number](2).longValue))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = (for {
      (ia, va, ca) <- v; (ib, vb, cb) <- v
      if ia < ib && ca == cb
      s = BigDecimal(cos(va, vb)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if s >= 0.4
    } yield (ia, ib, s)).toSet
    assert(got.map(p => (p._1, p._2)) == want.map(p => (p._1, p._2)), "pair sets differ")
    assert(got.nonEmpty, "fixture should contain at least one near-dup pair")
  }

  test("survivor set is a dominance fixed point on the fixture corpus") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val c = SimSearch.trainCentroidsLocked(emb, 16, 2)
    val surv = SimSearch.semanticDedup(emb, 0.4, c)
    val survEmb = emb.join(surv.select("vec_id"), "vec_id")
    val again = SimSearch.semanticDedup(survEmb, 0.4, c)
    // Fixed point: dedup over survivors keeps every survivor. (The
    // centroid table is held fixed — re-training on survivors would
    // move cells, which is a different, weaker statement.)
    assert(again.count() === surv.count())
  }
}
