package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Invariants of the Analytics battery beyond the oracle hash gate:
  * the PageRank integer recurrence against an in-driver reference on a
  * hand-built graph, and the structural contracts (split completeness,
  * rule symmetry, contingency-total consistency) that a hash match
  * alone wouldn't explain if they ever broke.
  */
class AnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  /** In-driver reference of the exact integer recurrence: plain Scala
    * maps, no Spark — if the distributed plan diverges from this, the
    * bug is in the plan, not the arithmetic.
    */
  private def referenceRanks(pairs: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val out = edges.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val deg = out.map { case (k, vs) => k -> vs.size.toLong }
    var r = deg.map { case (k, _) => k -> 1000000000L }
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((u, vs) <- out; c = r(u) / deg(u); v <- vs) contrib(v) += c
      r = deg.map { case (k, _) => k -> (150000000L + 85L * contrib(k) / 100L) }
    }
    r
  }

  test("pagerank matches the in-driver integer reference on a hand graph") {
    // Star (hub 1) + triangle (4,5,6) + bridge 1-4: asymmetric degrees
    // so floor division and damping actually discriminate.
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 7L), (4L, 5L), (4L, 6L),
      (5L, 6L), (1L, 4L))
    val got = Analytics.pagerankOnPairs(pairs.toDF("part_a", "part_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == referenceRanks(pairs, 3))
    // The hub out-ranks every leaf: damping shifted mass as designed.
    assert(got(1L) > got(2L) && got(1L) > got(7L))
  }

  test("pagerank is deterministic across runs") {
    val a = Analytics.pagerank(spark, sf0001).orderBy("node").collect().toSeq
    val b = Analytics.pagerank(spark, sf0001).orderBy("node").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("assoc_rules: both directions present, confidence <= 1, lift symmetric") {
    val rules = Analytics.assocRules(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rules.nonEmpty)
    val byPair = rules.map(r => (r._1, r._2) -> r).toMap
    rules.foreach { case (a, b, sup, conf, lift) =>
      assert(conf > 0 && conf <= 1.0)
      val rev = byPair((b, a))
      assert(rev._3 == sup, "support is direction-free")
      assert(rev._5 == lift, "lift is symmetric")
    }
  }

  test("chi_square: totals consistent and chi2 non-negative") {
    val cells = Analytics.chiSquare(spark, sf0001).collect()
    val nTotal = cells.map(_.getLong(2)).sum
    cells.foreach { r =>
      assert(r.getLong(5) == nTotal, "grand total identical on every cell")
      assert(r.getDouble(6) >= 0.0)
    }
    // Row totals: sum of obs within a region equals the stamped row_n.
    cells.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(2)).sum == rs.head.getLong(3))
    }
  }

  test("data_split: disjoint, complete, and stable under corpus growth") {
    val total = spark.read
      .parquet(s"$sf0001/documents.parquet").count()
    val split = Analytics.dataSplit(spark, sf0001).collect()
    assert(split.map(_.getLong(2)).sum == total, "every doc in exactly one split")
    // Stability: the assignment is a pure function of doc_id — the
    // same hash expression over a half corpus keeps every common doc
    // in its split (a row_number split would reshuffle).
    val assign = (df: org.apache.spark.sql.DataFrame) => df.select(col("doc_id"),
      (((col("doc_id") * 1103515245L + 12345L) % 2147483648L) % 10).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val full = assign(docs)
    val half = assign(docs.filter(col("doc_id") % 2 === 0))
    half.foreach { case (id, b) => assert(full(id) == b) }
  }

  test("conversion_lag: buckets partition the converted-user count") {
    val hist = Analytics.conversionLag(spark, sf0001).collect()
    assert(hist.nonEmpty)
    hist.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3), "min_us <= max_us")
      assert(r.getLong(1) > 0)
    }
  }
}
