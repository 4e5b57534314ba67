package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.Tables.t

/** MinHash-LSH near-dup: banding recall vs exact all-pairs Jaccard on
  * the documents fixture, plus the never-all-pairs property (candidate
  * count well below the pair count).
  */
class NearDupSpec extends SparkTestBase {

  test("nearDuplicatePairs matches exact all-pairs Jaccard at threshold 0.5") {
    val s = spark
    import s.implicits._
    val docs = t(s, sf0001, "documents")

    val lsh = NearDup.nearDuplicatePairs(docs, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // Exact reference: all-pairs Jaccard over the same shingle sets.
    val toks = split(trim($"text"), "\\s+")
    val sh = docs.filter(size(toks) >= 3)
      .select($"doc_id", NearDup.shingleSet($"text", 3).as("sh"))
    val jac = size(array_intersect($"sh_a", $"sh_b")).cast("double") /
      size(array_union($"sh_a", $"sh_b")).cast("double")
    val exact = sh.select($"doc_id".as("id_a"), $"sh".as("sh_a"))
      .crossJoin(sh.select($"doc_id".as("id_b"), $"sh".as("sh_b")))
      .filter($"id_a" < $"id_b")
      .filter(jac >= 0.5)
      .select($"id_a", $"id_b", round(jac, 6).as("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(lsh == exact)
    assert(exact.nonEmpty, "fixture should contain planted near-dup pairs")
  }

  test("a 50-deep chain collapses in far fewer rounds than its diameter") {
    val s = spark
    import s.implicits._
    // Sliding 40-word windows over one word stream: consecutive docs
    // share most shingles (an edge), distant docs share none — a
    // 50-node path whose diameter (49) exceeds MaxPropagationRounds
    // headroom for plain neighbor-min. Only the pointer-jumped loop
    // (O(log diameter) rounds) can collapse it to the global min.
    val stream = (0 until 140).map(i => f"w$i%03d")
    val docs = (0 until 50).map { i =>
      (i.toLong + 1, stream.slice(i * 2, i * 2 + 40).mkString(" "))
    }.toDF("doc_id", "text")
    val clusters = NearDup.nearDuplicateClusters(docs, "doc_id", "text", 0.3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.size === 50)
    assert(clusters.values.toSet === Set(1L),
      s"chain did not collapse to the min id: ${clusters.values.toSet}")
  }

  test("clusters are transitive: chained pairs collapse through the bridge doc") {
    val s = spark
    import s.implicits._
    // True chain: doc 20 bridges disjoint halves A and B, so 10~20 and
    // 20~30 are edges while 10 and 30 share NOTHING (J = 0) — only
    // multi-round propagation can give 30 the min label.
    val a = (1 to 30).map(i => s"aa$i").mkString(" ")
    val b = (1 to 30).map(i => s"bb$i").mkString(" ")
    val docs = Seq(
      (10L, a),
      (20L, s"$a $b"), // J(10,20) = J(20,30) ≈ 0.48; J(10,30) = 0
      (30L, b),
      (99L, (1 to 30).map(i => s"zz$i").mkString(" "))
    ).toDF("doc_id", "text")
    // sanity: the chain's ends are NOT a direct pair at this threshold
    val pairs = NearDup.nearDuplicatePairs(docs, "doc_id", "text", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((10L, 20L), (20L, 30L)))
    val clusters = NearDup.nearDuplicateClusters(docs, "doc_id", "text", 0.3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.get(10L).contains(10L))
    assert(clusters.get(20L).contains(10L))
    assert(clusters.get(30L).contains(10L)) // transitive through 20 only
    assert(!clusters.contains(99L))         // isolated docs aren't in the graph
  }

  test("one-pass codegen signature is bit-identical to the k-pass fold") {
    val s = spark
    import s.implicits._
    val docs = t(s, sf0001, "documents")
    val hs = NearDup.hashedShingles($"text", 3)
    val both = docs.filter(size(split(trim($"text"), "\\s+")) >= 3)
      .select($"doc_id",
        NearDup.signature(hs, 22).as("ref"),
        NearDup.signatureNative(hs, 22).as("native"))
      .filter(!($"ref" <=> $"native")).count()
    assert(both == 0, "native signature must match the declarative fold exactly")
  }

  test("native signature path works under ANSI mode (wrapping by construction)") {
    val s = spark
    val prev = s.conf.get("spark.sql.ansi.enabled")
    s.conf.set("spark.sql.ansi.enabled", "true")
    try {
      import s.implicits._
      val docs = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w q"))
        .toDF("doc_id", "text")
      // End-to-end pairs under ANSI: the permutation family overflows
      // mod 2^64 by design, which the declarative fold cannot survive
      // with ANSI on — the codegen'd signature wraps natively.
      val pairs = NearDup.nearDuplicatePairs(docs, "doc_id", "text", 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((1L, 2L)))
    } finally s.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("bandingFor derives geometry meeting the recall target at the threshold") {
    def capture(j: Double, k: Int, b: Int): Double =
      1.0 - math.pow(1.0 - math.pow(j, k / b), b)
    for (t <- Seq(0.3, 0.5, 0.7, 0.9); rec <- Seq(0.9, 0.95, 0.99)) {
      val (k, b) = NearDup.bandingFor(t, rec)
      assert(k % b == 0)
      assert(capture(t, k, b) >= rec, s"t=$t rec=$rec gave k=$k b=$b")
      // and not wastefully large: one band fewer must miss the target
      val r = k / b
      assert(capture(t, (b - 1) * r, b - 1) < rec || b == 1)
    }
  }

  test("a corpus with no near-dups yields empty clusters and full survivors") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha bravo charlie delta echo"),
      (2L, "foxtrot golf hotel india juliet"),
      (3L, "kilo lima mike november oscar"))
      .toDF("doc_id", "text")
    val clusters = NearDup.nearDuplicateClusters(docs, "doc_id", "text", 0.5)
    assert(clusters.columns.toSeq == Seq("doc_id", "cluster_id"))
    assert(clusters.count() == 0)
    val survivors = NearDup.dedupSurvivors(docs, "doc_id", "text", 0.5)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(1L, 2L, 3L))
  }

  test("one cluster pass feeds both the cluster map and the survivors") {
    val s = spark
    import s.implicits._
    val docs = t(s, sf0001, "documents")
    val clusters = NearDup
      .nearDuplicateClusters(docs, "doc_id", "text", 0.5).persist()
    val composed = NearDup
      .dedupSurvivors(docs, "doc_id", "text", 0.5,
        precomputedClusters = Some(clusters))
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val standalone = NearDup.dedupSurvivors(docs, "doc_id", "text", 0.5)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(composed == standalone)
    // survivors = corpus minus the non-minimum cluster members
    val losers = clusters.filter($"doc_id" =!= $"cluster_id")
      .collect().map(_.getLong(0)).toSet
    assert(composed == docs.select($"doc_id").collect().map(_.getLong(0)).toSet -- losers)
    clusters.unpersist()
  }

  test("contamination counts distinct shared shingles against the eval side") {
    val s = spark
    import s.implicits._
    // eval doc "a b c d e" has 3 distinct 3-shingles: [a b c][b c d][c d e]
    val eval = Seq((100L, "a b c d e")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a b c d e"),          // shares all 3
      (2L, "x y a b c d z"),      // shares [a b c][b c d]
      (3L, "c d e q r"),          // shares [c d e] only
      (4L, "p q r s t"),          // shares none
      (5L, "a b")                 // under shingle length — excluded
    ).toDF("doc_id", "text")
    val hits = NearDup.contamination(corpus, eval, "doc_id", "text", 3, minShared = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(hits.keySet == Set(1L, 2L, 3L))
    assert(hits(1L) == ((3L, 1.0)))
    assert(hits(2L) == ((2L, math.round(2.0 / 3 * 1e6) / 1e6)))
    assert(hits(3L) == ((1L, math.round(1.0 / 3 * 1e6) / 1e6)))
    // minShared gates low-overlap pairs out
    val gated = NearDup.contamination(corpus, eval, "doc_id", "text", 3, minShared = 2)
      .collect().map(_.getLong(0)).toSet
    assert(gated == Set(1L, 2L))
  }

  test("banding prunes: candidate pairs well below all-pairs count") {
    val s = spark
    import s.implicits._
    val docs = t(s, sf0001, "documents")
    val n = docs.count()
    val sh = docs.filter(size(split(trim($"text"), "\\s+")) >= 3)
      .select($"doc_id", NearDup.hashedShingles($"text", 3).as("hs"))
    val banded = sh.select($"doc_id",
      posexplode(NearDup.bandKeys($"hs", 8, 2)).as(Seq("band", "bkey")))
    val candidates = banded.select($"band", $"bkey", $"doc_id".as("id_a"))
      .join(banded.select($"band", $"bkey", $"doc_id".as("id_b")), Seq("band", "bkey"))
      .filter($"id_a" < $"id_b")
      .select("id_a", "id_b").distinct().count()
    val allPairs = n * (n - 1) / 2
    assert(candidates < allPairs / 10,
      s"banding should prune: $candidates candidates vs $allPairs pairs")
  }

  /** The extracted propagation core, unit-tested on hand-built graphs:
    * a long chain (the pointer-jumping motivation — O(log diameter)
    * rounds), two disjoint components, and the no-isolated-nodes
    * contract. Labels must be the component MINIMUM for every member.
    */
  test("connectedComponents labels every member with the component minimum") {
    val s = spark; import s.implicits._
    // chain 10-11-...-29 (diameter 19), triangle {100,101,102},
    // isolated pair {200,201}
    val undirected =
      (10L until 29L).map(i => (i, i + 1)) ++
        Seq((100L, 101L), (101L, 102L), (100L, 102L), (200L, 201L))
    val edges = undirected.toDF("a", "b")
      .select(col("a").as("src"), col("b").as("dst"))
      .unionAll(undirected.toDF("a", "b")
        .select(col("b").as("src"), col("a").as("dst")))
    val got = NearDup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == ((10L to 29L) ++ Seq(100L, 101L, 102L, 200L, 201L)).toSet)
    (10L to 29L).foreach(n => assert(got(n) == 10L, s"chain node $n"))
    Seq(100L, 101L, 102L).foreach(n => assert(got(n) == 100L))
    Seq(200L, 201L).foreach(n => assert(got(n) == 200L))
  }
}
