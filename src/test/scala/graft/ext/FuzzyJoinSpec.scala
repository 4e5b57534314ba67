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
}
