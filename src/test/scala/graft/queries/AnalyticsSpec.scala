package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

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

  test("density-normalized support floor keeps the pair graph sparse under scale-up") {
    // Base baskets: pair (1,2) in 3/10 baskets, (1,3) in 1/10, plus
    // per-basket noise items. A 10x "scale-up" replays every basket 10
    // times under fresh ids — the saturation model: raw co-occurrence
    // counts grow with data volume, association FREQUENCIES don't.
    val base = (0 until 10).flatMap { o =>
      val items = Seq(100L + o) ++ (if (o < 3) Seq(1L, 2L) else Nil) ++
        (if (o == 5) Seq(1L, 3L) else Nil)
      items.map(i => (o.toLong, i))
    }
    val scaled = (0 until 10).flatMap(k =>
      base.map { case (o, i) => (o + 100L * k, i) })
    def mine(rows: Seq[(Long, Long)], frac: Option[Double]) =
      ScaleOps.minePairs(rows.toDF("o", "i"), "o", "i", 2, frac)
        .select("part_a", "part_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Fixed >=2 floor: exact at 1x, saturates at 10x — the (1,3)
    // one-off association now "co-occurs" 10 times and pollutes the graph.
    assert(mine(base, None) == Set((1L, 2L)))
    assert(mine(scaled, None).contains((1L, 3L)), "fixed floor saturates by design")
    // Normalized >=20% floor: the SAME sparse edge set at both scales.
    assert(mine(base, Some(0.2)) == Set((1L, 2L)))
    assert(mine(scaled, Some(0.2)) == Set((1L, 2L)))
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

  test("price_deciles: two-level prefix sum equals the naive global ntile window") {
    import org.apache.spark.sql.expressions.Window
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(expr("cast(round(l_extendedprice * 100, 0) as bigint)").as("cents"),
        col("l_orderkey"), col("l_linenumber"))
    val naive = li
      .withColumn("decile", ntile(10).over(Window.orderBy(
        col("cents"), col("l_orderkey"), col("l_linenumber"))))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_rows"), min(col("cents")).as("min_cents"),
        max(col("cents")).as("max_cents"), sum(col("cents")).as("sum_cents"))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val got = Analytics.priceDeciles(spark, sf0001)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == naive)
    assert(got.size == 10)
  }

  test("groupk_sample: exactly min(5, group size) rows per source") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val sizes = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Analytics.groupKSample(spark, sf0001)
      .collect().groupBy(_.getString(1)).map { case (s, rs) => s -> rs.length }
    assert(got.keySet == sizes.keySet)
    got.foreach { case (s, n) => assert(n == math.min(5L, sizes(s))) }
  }

  test("touch_attribution: every purchase attributed exactly once") {
    val e = spark.read.parquet(s"$sf0001/events.parquet")
    val purchases = e.filter(col("event_type") === "purchase").count()
    val attributed = Analytics.touchAttribution(spark, sf0001)
      .collect().map(_.getLong(1)).sum
    assert(attributed == purchases)
  }

  test("ks_test: two-level cumsum equals the naive global window; D in [0,1]") {
    import org.apache.spark.sql.expressions.Window
    val x = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .filter(col("l_returnflag").isin("R", "N"))
      .select(expr("cast(round(l_extendedprice * 100, 0) as bigint)").as("cents"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("a"),
        when(col("l_returnflag") === "N", 1L).otherwise(0L).as("b"))
    val g = x.groupBy("cents").agg(sum("a").as("ca"), sum("b").as("cb"))
    val w = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = g.agg(sum("ca"), sum("cb")).head()
    val (n1, n2) = (tot.getLong(0), tot.getLong(1))
    val naive = g.select(
        abs(sum(col("ca")).over(w) * n2 - sum(col("cb")).over(w) * n1).as("x"))
      .agg(max("x")).head().getLong(0)
    val got = Analytics.ksTest(spark, sf0001).head()
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == (n1, n2, naive))
    assert(got.getDouble(3) >= 0.0 && got.getDouble(3) <= 1.0)
  }

  test("corr_exact: derived r matches Spark's float corr to 1e-6; moments exact") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_quantity").cast("long").as("x"),
        expr("cast(round(l_extendedprice * 100, 0) as bigint)").as("y"))
    val floatR = li.agg(corr(col("x"), col("y"))).head().getDouble(0)
    val moments = Analytics.corrExact(spark, sf0001)
    // Hashed frame carries only the exact moments — no float column.
    assert(moments.schema.fields.forall(_.dataType != DoubleType))
    val got = Analytics.corrDerived(moments).head()
    val r = got.getDouble(got.length - 1)
    assert(math.abs(r - floatR) < 1e-6, s"derived r $r vs float corr $floatR")
    assert(got.getLong(0) == li.count())
  }

  test("rank_normalize: pr spans [0,1] within every source") {
    val rows = Analytics.rankNormalize(spark, sf0001).collect()
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      val prs = rs.map(_.getDouble(3))
      assert(prs.min == 0.0 && prs.max == 1.0)
      assert(prs.forall(p => p >= 0.0 && p <= 1.0))
    }
  }

  test("ols_by_group: derived slope/intercept match regr_slope/intercept") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("x"),
        expr("cast(round(l_extendedprice * 100, 0) as bigint)").as("y"))
    val ref = li.groupBy("l_returnflag")
      .agg(expr("regr_slope(y, x)").as("s"), expr("regr_intercept(y, x)").as("i"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val moments = Analytics.olsByGroup(spark, sf0001)
    assert(moments.schema.fields.forall(_.dataType != DoubleType))
    Analytics.olsDerived(moments).collect().foreach { r =>
      val (s0, i0) = ref(r.getString(0))
      val (sl, ic) = (r.getDouble(r.length - 2), r.getDouble(r.length - 1))
      assert(math.abs(sl - s0) < 1e-6, s"slope $sl vs $s0")
      assert(math.abs(ic - i0) < 1e-4, s"intercept $ic vs $i0")
    }
  }

  test("source_overlap: complete pair matrix, jaccard in (0,1]") {
    val rows = Analytics.sourceOverlap(spark, sf0001).collect()
    val sources = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("source").distinct().count().toInt
    // Fixture sources share the same vocabulary pool, so every pair
    // shares at least one token and the matrix is complete.
    assert(rows.length == sources * (sources - 1) / 2)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "canonical pair order")
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("novelty_score: ratios consistent and globally conserved") {
    val rows = Analytics.noveltyScore(spark, sf0001).collect()
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "novel <= total")
      val want = BigDecimal(r.getLong(2).toDouble / r.getLong(1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) == want)
    }
    // Global conservation: Σ novel == number of df==1 shingles.
    val sh = graft.ext.NearDup.shingleSets(
        spark.read.parquet(s"$sf0001/documents.parquet"), "doc_id", "text", 3)
      .select(explode(col("hs")).as("h"))
    val singletons = sh.groupBy("h").count().filter(col("count") === 1).count()
    assert(rows.map(_.getLong(2)).sum == singletons)
  }

  test("winsorize matches a driver-side reference on the fixture") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_returnflag"),
        expr("cast(round(l_extendedprice * 100, 0) as bigint)").as("cents"),
        col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val ref = li.groupBy(_._1).map { case (flag, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3, r._4)).map(_._2)
      val n = sorted.length
      val lo = sorted(n / 100 + 1 - 1)
      val hi = sorted(n - n / 100 - 1)
      flag -> (n.toLong, lo, hi, sorted.sum,
        sorted.map(c => math.max(math.min(c, hi), lo)).sum)
    }
    Analytics.winsorize(spark, sf0001).collect().foreach { r =>
      assert(ref(r.getString(0)) ==
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    }
  }

  test("hist_overlap: overlap in [0,1] and matches a driver-side reference") {
    val rows = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .filter(col("l_returnflag").isin("R", "N"))
      .select(expr("cast(round(l_extendedprice * 100, 0) as bigint) div 100000L")
          .as("bucket"), col("l_returnflag"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byBucket = rows.groupBy(_._1).map { case (b, rs) =>
      b -> (rs.count(_._2 == "R").toLong, rs.count(_._2 == "N").toLong)
    }
    val n1 = rows.count(_._2 == "R").toLong
    val n2 = rows.count(_._2 == "N").toLong
    val num = byBucket.values.map { case (ca, cb) => math.min(ca * n2, cb * n1) }.sum
    val got = Analytics.histOverlap(spark, sf0001).head()
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == ((n1, n2, num)))
    assert(got.getDouble(3) >= 0.0 && got.getDouble(3) <= 1.0)
  }

  test("cramers_v: v in [0,1] and chi2 equals the rounded-cell decimal sum") {
    val got = Analytics.cramersV(spark, sf0001).head()
    assert(got.getDouble(2) >= 0.0 && got.getDouble(2) <= 1.0)
    val cells = Analytics.chiSquare(spark, sf0001).collect()
    val want = cells.map(r => BigDecimal(r.getDouble(6)).setScale(6)).sum.toDouble
    assert(got.getDouble(1) == want)
  }

  test("embed_score: integer dot matches a driver-side recompute; labels partition") {
    val rows = Analytics.embedScore(spark, sf0001).collect()
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val w = (0 until 64).map(i => ((i * 37) % 21 - 10).toLong)
    rows.take(20).foreach { r =>
      val v = emb(r.getLong(0)).map(_.toDouble)
      val s = v.map(math.abs).max / 127.0
      val q = if (s == 0) v.map(_ => 0L)
        else v.map(x => math.floor(x / s + 0.5).toLong)
      val want = q.zip(w).map { case (a, b) => a * b }.sum
      assert(r.getLong(1) == want)
      assert(r.getString(2) == (if (want > 0) "keep" else "drop"))
    }
    assert(rows.length == emb.size)
  }

  test("event_trigrams: total trigram mass is conserved") {
    val perUser = spark.read.parquet(s"$sf0001/events.parquet")
      .groupBy("user_id").count()
      .collect().map(r => math.max(0L, r.getLong(1) - 2)).sum
    val got = Analytics.eventTrigrams(spark, sf0001).collect().map(_.getLong(3)).sum
    assert(got == perUser)
  }

  test("degree_hist and session_lengths conserve node/session counts") {
    val nodes = Analytics.pagerank(spark, sf0001).count()
    assert(Analytics.degreeHist(spark, sf0001)
      .collect().map(_.getLong(1)).sum == nodes)
    val sessions = graft.stream.EventWindows.sessionByUser(
      graft.Tables.t(spark, sf0001, "events"), "30 minutes").count()
    assert(Analytics.sessionLengths(spark, sf0001)
      .collect().map(_.getLong(1)).sum == sessions)
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
