package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The custom-exec contract beyond the shared native-ASOF oracle:
  * hand-built edge semantics (ties, no-earlier-row, null lanes,
  * cross-key isolation), equality with the window encoding on the
  * fixture, and the PLAN properties that are the operator's reason to
  * exist — EnsureRequirements inserts the exchanges/sorts from the
  * declared requirements, and a downstream per-key aggregate plans
  * with ZERO additional exchanges off the preserved partitioning.
  */
class AsofExecSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("hand-built edges: ties match, earlier-only, nulls, key isolation") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),   // tie with right at 10:00 → matches
      (1L, ts("2024-01-01 09:00:00"), "b"),   // before any right row → null
      (1L, ts("2024-01-01 12:00:00"), "c"),   // picks 11:00, not 10:00
      (2L, ts("2024-01-01 12:00:00"), "d"),   // other key: only its own rows
      (3L, ts("2024-01-01 12:00:00"), "e")    // key with no right rows → null
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, ts("2024-01-01 11:00:00"), 11.0),
      (2L, ts("2024-01-01 11:30:00"), 99.0)
    ).toDF("rk", "rt", "v")
    val got = AsofExec.asofBackward(left, "k", "t", right, "rk", "rt", Seq("v"))
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(got === Map(
      "a" -> Some(10.0), "b" -> None, "c" -> Some(11.0),
      "d" -> Some(99.0), "e" -> None))
  }

  test("agrees with the window encoding row-for-row on the fixture") {
    val events = graft.Tables.t(spark, sf0001, "events")
      .select($"event_id", $"user_id", $"ts", $"event_type")
    val purchases = events.filter($"event_type" === "purchase")
      .groupBy($"user_id".as("p_user"), $"ts".as("purchase_ts"))
      .agg(max(lit(1.0)).as("pv"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), Option(r.get(4)))).toMap
    val viaExec = canon(AsofExec.asofBackward(
      events, "user_id", "ts", purchases, "p_user", "purchase_ts",
      Seq("purchase_ts", "pv")))
    val viaWindow = canon(graft.ext.AsofJoin.asofBackward(
      events, "user_id", "ts", purchases, "p_user", "purchase_ts",
      Seq("purchase_ts", "pv")))
    assert(viaExec.size === viaWindow.size)
    assert(viaExec === viaWindow)
  }

  test("plan: exchanges/sorts are planned from the declared requirements, and a downstream per-key aggregate adds none") {
    val left = (0 until 1000).map(i =>
      (i.toLong % 50, ts(f"2024-01-01 ${i % 24}%02d:00:00"), i)).toDF("k", "t", "x")
    val right = (0 until 200).map(i =>
      (i.toLong % 50, ts(f"2024-01-01 ${i % 12}%02d:30:00"), i * 1.0)).toDF("rk", "rt", "v")
    val joined = AsofExec.asofBackward(left, "k", "t", right, "rk", "rt", Seq("v"))
    val downstream = joined.groupBy($"k").agg(sum($"x").as("sx"), max($"v").as("mv"))
    downstream.collect() // materialize so AQE settles its final plan
    // AQE hides materialized stages behind leaf QueryStageExec wrappers
    // — flatten through them (and the adaptive root) before counting.
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case other => other.children
      }
      p +: kids.flatMap(allNodes)
    }
    val nodes = allNodes(downstream.queryExecution.executedPlan)
    val execs = nodes.collect { case e: GraftAsofExec => e }
    assert(execs.size === 1,
      s"custom exec missing from plan:\n${downstream.queryExecution.executedPlan}")
    val shuffles = nodes.collect { case s: ShuffleExchangeExec => s }
    // Exactly the two input exchanges the requirements demand — the
    // aggregate rides the exec's preserved hash partitioning on k.
    assert(shuffles.size === 2,
      s"expected 2 exchanges (exec inputs only), got ${shuffles.size}")
    // Exactness on this shape too (against the window encoding).
    val expect = graft.ext.AsofJoin.asofBackward(
      left, "k", "t", right, "rk", "rt", Seq("v"))
      .groupBy($"k").agg(sum($"x").as("sx"), max($"v").as("mv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    val got = downstream.collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    assert(got === expect)
  }
}
