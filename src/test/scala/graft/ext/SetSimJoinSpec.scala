package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.Tables.t

/** Prefix-filtered set-similarity join: EXACT equality with brute-force
  * all-pairs Jaccard (completeness is a theorem for this operator, so
  * the assertion is set equality, not a recall bound), across
  * thresholds and on adversarial shapes (chains, containment,
  * size-skewed pairs); plus the plan-shape guarantee that no cartesian
  * product ever appears.
  */
class SetSimJoinSpec extends SparkTestBase {

  private def bruteForce(docs: org.apache.spark.sql.DataFrame, threshold: Double,
      n: Int = 3): Set[(Long, Long, Double)] = {
    val s = spark; import s.implicits._
    val toks = split(trim($"text"), "\\s+")
    val sh = docs.filter(size(toks) >= n)
      .select($"doc_id", NearDup.hashedShingles($"text", n).as("sh"))
    val jac = size(array_intersect($"sh_a", $"sh_b")).cast("double") /
      size(array_union($"sh_a", $"sh_b")).cast("double")
    sh.select($"doc_id".as("id_a"), $"sh".as("sh_a"))
      .crossJoin(sh.select($"doc_id".as("id_b"), $"sh".as("sh_b")))
      .filter($"id_a" < $"id_b" && jac >= threshold)
      .select($"id_a", $"id_b", round(jac, 6).as("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  private def prefixJoin(docs: org.apache.spark.sql.DataFrame,
      threshold: Double): Set[(Long, Long, Double)] =
    SetSimJoin.jaccardPairs(docs, "doc_id", "text", threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("equals brute-force all-pairs on the documents fixture at several thresholds") {
    val docs = t(spark, sf0001, "documents")
    for (th <- Seq(0.3, 0.6, 0.9)) {
      val got = prefixJoin(docs, th)
      val want = bruteForce(docs, th)
      assert(got == want, s"threshold $th: prefix join diverged from brute force")
    }
    assert(bruteForce(docs, 0.6).nonEmpty, "fixture should contain pairs above 0.6")
  }

  test("adversarial shapes: containment, chains, size skew — still exact") {
    val s = spark; import s.implicits._
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base),                                          // a
      (2L, base + " extra1 extra2 extra3"),                // superset of a
      (3L, (1 to 20).map(i => s"w$i").mkString(" ")),      // half of a (containment)
      (4L, (10 to 50).map(i => s"w$i").mkString(" ")),     // shifted overlap
      (5L, (1 to 200).map(i => s"w$i").mkString(" ")),     // big: size-skewed vs a
      (6L, (1 to 40).map(i => s"v$i").mkString(" ")),      // disjoint
      (7L, base)                                           // identical twin of a
    ).toDF("doc_id", "text")
    for (th <- Seq(0.2, 0.5, 0.8))
      assert(prefixJoin(docs, th) == bruteForce(docs, th), s"diverged at θ=$th")
  }

  test("plan never contains a cartesian product or broadcast nested loop") {
    val plan = SetSimJoin.jaccardPairs(
        t(spark, sf0001, "documents"), "doc_id", "text", 0.6)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "cartesian product in plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "BNLJ in plan")
  }

  private def bruteContainment(needles: org.apache.spark.sql.DataFrame,
      corpus: org.apache.spark.sql.DataFrame,
      threshold: Double): Set[(Long, Long, Double)] = {
    val s = spark; import s.implicits._
    val shN = NearDup.shingleSets(needles, "doc_id", "text", 3)
      .select($"doc_id".as("needle_id"), $"hs".as("hs_n"))
    val shC = NearDup.shingleSets(corpus, "doc_id", "text", 3)
      .select($"doc_id".as("corpus_id"), $"hs".as("hs_c"))
    val cont = size(array_intersect($"hs_n", $"hs_c")).cast("double") /
      size($"hs_n").cast("double")
    shN.crossJoin(shC).filter(cont >= threshold)
      .select($"needle_id", $"corpus_id", round(cont, 6).as("containment"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  test("containment join equals brute force; catches what Jaccard cannot") {
    val s = spark; import s.implicits._
    val long = (1 to 200).map(i => s"w$i").mkString(" ")
    val needles = Seq(
      (101L, (50 to 69).map(i => s"w$i").mkString(" ")), // inside `long`
      (102L, (1 to 20).map(i => s"u$i").mkString(" "))   // nowhere
    ).toDF("doc_id", "text")
    val corpus = Seq((1L, long), (2L, (1 to 40).map(i => s"v$i").mkString(" ")))
      .toDF("doc_id", "text")
    for (th <- Seq(0.5, 0.8, 1.0)) {
      val got = SetSimJoin.containmentPairs(needles, corpus, "doc_id", "text", th)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == bruteContainment(needles, corpus, th), s"diverged at θ=$th")
    }
    // The motivating asymmetry: needle 101 is FULLY contained in doc 1
    // (containment 1.0) while their Jaccard is tiny — the union is
    // corpus-document-sized — so the Jaccard join at the same
    // threshold is blind to the leak.
    val contained = SetSimJoin.containmentPairs(
        needles, corpus, "doc_id", "text", 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(contained == Set((101L, 1L)))
    val jac = SetSimJoin.jaccardPairs(
        needles.union(corpus), "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((101L, 1L)) && !jac.contains((1L, 101L)))
  }

  test("containment join on the fixture needles equals brute force") {
    val docs = t(spark, sf0001, "documents")
    val needles = docs.filter(col("doc_id") % 10 === 3)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ws"))
      .select(col("doc_id"),
        array_join(expr("slice(ws, 1, (size(ws) * 3) div 5)"), " ").as("text"))
    val got = SetSimJoin.containmentPairs(needles, docs, "doc_id", "text", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == bruteContainment(needles, docs, 0.8))
    assert(got.nonEmpty, "every truncated needle is contained in its source")
  }

  test("prefix index carries far fewer rows than the full token stream") {
    val s = spark; import s.implicits._
    // At θ=0.9 the prefix keeps |s| - ceil(0.9|s|) + 1 ≈ 10% of each
    // set +1 — the inverted index is an order of magnitude lighter
    // than indexing every shingle (the AllPairs selling point).
    val docs = t(s, sf0001, "documents")
    val sh = NearDup.shingleSets(docs, "doc_id", "text", 3)
    val full = sh.select(explode($"hs")).count()
    val prefixRows = sh
      .select(size($"hs").as("sz"))
      .select(($"sz" - ceil($"sz" * 0.9).cast("int") + 1).as("p"))
      .agg(sum($"p")).head().getLong(0)
    assert(prefixRows < full / 5,
      s"prefix index ($prefixRows) should be well under the full index ($full)")
  }
}
