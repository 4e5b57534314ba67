package graft.transform

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** CDC merge semantics (latest-wins, delete, insert, pass-through,
  * delete-then-reinsert) and the base-never-shuffles plan shape.
  */
class CdcMergeSpec extends SparkTestBase {

  private def base = {
    val s = spark; import s.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "name", "bal")
  }

  private def chg(rows: (Long, String, Double, String, Int)*) = {
    val s = spark; import s.implicits._
    rows.toSeq.toDF("k", "name", "bal", "op", "seq")
  }

  test("latest change per key wins; D deletes; I inserts; rest pass through") {
    val changes = chg(
      (1L, "a", 11.0, "U", 1), (1L, "a", 12.0, "U", 2), // stacked updates
      (2L, "b", 20.0, "D", 1),                          // delete
      (9L, "i", 90.0, "I", 1))                          // insert
    val got = CdcMerge.applyChanges(base, changes, "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set(
      (1L, "a", 12.0), // newest update won
      (3L, "c", 30.0), (4L, "d", 40.0), // untouched
      (9L, "i", 90.0))) // inserted; key 2 gone
  }

  test("delete then re-insert on the same key resolves by sequence order") {
    val changes = chg(
      (3L, "c", 0.0, "D", 1),
      (3L, "c2", 33.0, "I", 2)) // re-insert AFTER the delete → row lives
    val got = CdcMerge.applyChanges(base, changes, "k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.contains((3L, "c2")))
    val reversed = chg(
      (3L, "c2", 33.0, "I", 1),
      (3L, "c", 0.0, "D", 2)) // delete is newest → row dies
    val got2 = CdcMerge.applyChanges(base, reversed, "k")
      .collect().map(_.getLong(0)).toSet
    assert(!got2.contains(3L))
  }

  test("broadcastFeed=false gives identical results via a non-broadcast anti-join") {
    val changes = chg(
      (1L, "a", 11.0, "U", 1), (1L, "a", 12.0, "U", 2),
      (2L, "b", 20.0, "D", 1),
      (9L, "i", 90.0, "I", 1))
    val hinted = CdcMerge.applyChanges(base, changes, "k")
      .collect().map(_.toSeq).toSet
    val unhinted = CdcMerge.applyChanges(base, changes, "k",
        broadcastFeed = false)
      .collect().map(_.toSeq).toSet
    assert(hinted == unhinted)
    // And the escape hatch really dropped the hint: with AQE off and
    // auto-broadcast disabled, no broadcast anti-join appears.
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val savedBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = CdcMerge.applyChanges(base, changes, "k", broadcastFeed = false)
        .queryExecution.executedPlan
      assert(plan.collect { case j: BroadcastHashJoinExec => j }.isEmpty,
        s"expected no broadcast join with the hint disabled:\n$plan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
    }
  }

  test("base side survives via a broadcast anti-join — no base shuffle") {
    // Static plan (AQE off) so the join strategy is directly
    // inspectable; the production path keeps AQE on.
    val saved = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val changes = chg((1L, "a", 11.0, "U", 1))
      val merged = CdcMerge.applyChanges(base, changes, "k")
      val plan = merged.queryExecution.executedPlan
      val antis = plan.collect {
        case j: BroadcastHashJoinExec if j.joinType.sql.contains("ANTI") => j
      }
      assert(antis.nonEmpty, s"expected broadcast anti-join, got:\n$plan")
      // The base flows through the anti-join's streamed side with NO
      // exchange above or below it — every shuffle in the plan belongs
      // to the (small) change feed's latest-wins window.
      assert(antis.head.left.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"base side must be shuffle-free:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
  }
}
