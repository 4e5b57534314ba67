package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Blocked edit-distance matching: finds planted typos sharing the
  * block, never crosses blocks (the documented recall contract), and
  * never plans a cartesian product.
  */
class FuzzyJoinSpec extends SparkTestBase {

  private def entities = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "ACME Corporation"),
      (2L, "ACME Corporatio"),   // deletion, same block
      (3L, "ACME Corporatian"),  // substitution, same block
      (4L, "ACME Inc"),          // same block, far (dist > 1)
      (5L, "ACMF Corporation"),  // typo INSIDE the block key: cross-block, invisible
      (6L, "Widgets Ltd")
    ).toDF("id", "name")
  }

  test("finds within-block typos at maxDist=1, excludes far names and cross-block typos") {
    val got = FuzzyJoin.blockedPairs(entities, "id", "name",
        substring(col("name"), 1, 4), maxDist = 1)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (2,3) is NOT a pair: "Corporatio"→"Corporatian" needs two edits
    // (o→a substitution + n insertion).
    assert(got == Set((1L, 2L), (1L, 3L)))
  }

  test("maxDist=0 degenerates to exact-name pairs") {
    val s = spark; import s.implicits._
    val withDup = entities.unionByName(Seq((7L, "ACME Corporation")).toDF("id", "name"))
    val got = FuzzyJoin.blockedPairs(withDup, "id", "name",
        substring(col("name"), 1, 4), maxDist = 0)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 7L)))
  }

  test("plan joins on the block key — no cartesian product") {
    val plan = FuzzyJoin.blockedPairs(entities, "id", "name",
        substring(col("name"), 1, 4), maxDist = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  /** One pathological blocking key (everyone named SMITH) must not
    * serialize into a single quadratic task: with cap c the block
    * splits into id-ordered chunks of ≤ c rows, cells distribute, and
    * the PAIR SET is bit-identical to the uncapped join.
    */
  test("planted hot block: salted cells reproduce the uncapped result exactly") {
    val s = spark; import s.implicits._
    // 120 SMITH-block rows with planted near-dups + a control block.
    val hot = (0 until 120).map { i =>
      val name = if (i % 10 == 0) "SMITH ENTERPRISES LLC" else f"SMITH HOLDING $i%03d"
      (i.toLong, name)
    }
    val df = (hot ++ Seq((900L, "Widgets Ltd"), (901L, "Widgets Ltc"))).toDF("id", "name")
    val blockOn = substring(col("name"), 1, 5)
    def pairs(cap: Int) = FuzzyJoin.blockedPairs(df, "id", "name", blockOn,
        maxDist = 2, blockCap = cap)
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val uncapped = pairs(Int.MaxValue)
    // The 12 identical "SMITH ENTERPRISES LLC" rows alone give 66 pairs.
    assert(uncapped.size >= 66 && uncapped.contains((900L, 901L, 1)))
    assert(pairs(16) == uncapped, "cap=16 (8 chunks) must not change the result")
    assert(pairs(7) == uncapped, "cap=7 (18 chunks) must not change the result")
  }

  /** The FastSS deletion-neighborhood path (maxDist = 1) must equal a
    * driver-side brute force over every within-block pair, on a corpus
    * that exercises ALL single-edit shapes — substitution, insertion,
    * deletion, exact duplicates, differing lengths — plus dist-2
    * decoys and the "xy"/"yx" false-positive collision the verify has
    * to reject.
    */
  test("FastSS del-key path equals brute-force levenshtein on all edit shapes") {
    val s = spark; import s.implicits._
    val names = Seq(
      1L -> "alpha", 2L -> "alpht",       // substitution (equal length)
      3L -> "alphax", 4L -> "alph",       // insertion / deletion vs "alpha"
      5L -> "alpah",                      // transposition: dist 2 from alpha — decoy
      6L -> "alpha",                      // exact duplicate of 1
      7L -> "axy", 8L -> "ayx",           // share del-key "ay"? (false-positive class)
      9L -> "a", 10L -> "ab", 11L -> "b", // tiny strings, cross-length edits
      12L -> "beta")
    val df = names.toDF("id", "name")
    // one global block: blocking completeness is not under test here
    val got = FuzzyJoin.blockedPairs(df, "id", "name", lit("B"), maxDist = 1)
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => i.max(j))
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expect = (for {
      (ia, na) <- names; (ib, nb) <- names
      if ia < ib && lev(na, nb) <= 1
    } yield (ia, ib, lev(na, nb))).toSet
    assert(got == expect, s"got=$got expect=$expect")
    // sanity on the shapes this corpus plants:
    assert(expect.contains((1L, 2L, 1)) && expect.contains((1L, 3L, 1)) &&
      expect.contains((1L, 4L, 1)) && expect.contains((1L, 6L, 0)))
    assert(!expect.exists(p => p._1 == 1L && p._2 == 5L), "transposition is dist 2")
    assert(!expect.contains((7L, 8L, 1)), "axy/ayx is dist 2 despite shared del-key")
  }

  test("FastSS path honors the block boundary like the cross path") {
    val got = FuzzyJoin.blockedPairs(entities, "id", "name",
        substring(col("name"), 1, 4), maxDist = 1, blockCap = 3)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // same contract as the headline test, under salting (cap=3)
    assert(got == Set((1L, 2L), (1L, 3L)))
  }

  test("chunk assignment bounds per-cell work and respects id order") {
    val s = spark; import s.implicits._
    val keyed = ((0 until 100).map(i => (i.toLong, s"n$i", "HOT")) ++
      Seq((500L, "x", "COLD"))).toDF("id", "name", "blk")
    val assigned = FuzzyJoin.chunked(keyed, cap = 30).collect()
    val hot = assigned.filter(_.getAs[String]("blk") == "HOT")
    val byChunk = hot.groupBy(_.getAs[Int]("chunk")).view.mapValues(_.map(_.getLong(0)))
    // ⌈100/30⌉ = 4 chunks, each ≤ 30 rows, contiguous in id order.
    assert(byChunk.keySet == Set(0, 1, 2, 3))
    assert(byChunk.values.forall(_.length <= 30))
    val maxOf = byChunk.mapValues(_.max).toMap
    val minOf = byChunk.mapValues(_.min).toMap
    (0 until 3).foreach(k => assert(maxOf(k) < minOf(k + 1), "chunks must be id-ordered"))
    // Small blocks stay single-chunk.
    assert(assigned.filter(_.getAs[String]("blk") == "COLD")
      .forall(r => r.getAs[Int]("chunk") == 0 && r.getAs[Int]("nchunks") == 1))
  }
}
