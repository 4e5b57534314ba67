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
