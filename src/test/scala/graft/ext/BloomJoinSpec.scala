package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.BloomContains

/** Runtime Bloom-filter join pruning: exactness vs the plain join, the
  * pre-exchange plan position of the membership filter, and the pruning
  * actually biting before the shuffle.
  */
class BloomJoinSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val fact = (1L to 10000L).map(i => (i, i % 400)).toDF("f_id", "f_key")
  // 20 of 400 fact key values match → 5 % selectivity.
  private lazy val dim = (0L until 20L).map(k => (k, s"dim$k")).toDF("d_key", "d_name")

  test("pruned join result equals the plain join exactly") {
    val pruned = BloomJoin.prunedEquiJoin(fact, "f_key", dim, "d_key",
      expectedItems = 1000L, fpp = 0.01)
      .select($"f_id", $"f_key", $"d_name")
    val plain = fact.join(dim, $"f_key" === $"d_key").select($"f_id", $"f_key", $"d_name")
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
    assert(pruned.count() == 500) // 10000 / 400 * 20
  }

  test("membership filter sits below the join, on the fact scan side") {
    // Parquet-backed inputs: a LocalTableScan would let
    // ConvertToLocalRelation pre-evaluate the filter out of the plan.
    val orders = graft.Tables.t(spark, sf0001, "orders")
    val cust = graft.Tables.t(spark, sf0001, "customer")
      .filter($"c_mktsegment" === "BUILDING")
    val q = BloomJoin.prunedEquiJoin(orders, "o_custkey", cust, "c_custkey",
      expectedItems = 1000L, fpp = 0.01)
    q.count() // finalize AQE
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_contains"),
      s"expected the bloom membership filter in the plan:\n$plan")
    // toString prints the join above its children: the membership
    // filter must appear BELOW the join node (fact scan side), proving
    // it prunes rows before they reach the join, not after.
    val joinIdx = plan.indexOf("Join")
    val bloomIdx = plan.indexOf("graft_bloom_contains")
    assert(joinIdx >= 0 && bloomIdx > joinIdx,
      s"bloom filter should be under the join, plan:\n$plan")
  }

  test("bloom pre-filter drops the non-matching fraction (plus bounded FPs)") {
    val keyed = dim.select($"d_key".cast("long").as("k"))
    val bloom = keyed.stat.bloomFilter("k", 1000L, 0.01)
    val surviving = fact.filter(BloomContains($"f_key".cast("long"), bloom)).count()
    // True matches: 500. With fpp=1 % the 9,500 non-matching rows admit
    // ~95 false positives; 3× headroom keeps the assert load-stable.
    assert(surviving >= 500 && surviving < 500 + 300,
      s"bloom should prune most non-matching rows, survived: $surviving")
  }

  test("null fact keys are dropped, null dim keys don't poison the filter") {
    val factN = fact.union(Seq((99999L, -1L)).toDF("f_id", "f_key")
      .select($"f_id", lit(null).cast("long").as("f_key")))
    val dimN = dim.union(Seq((-1L, "null-dim")).toDF("d_key", "d_name")
      .select(lit(null).cast("long").as("d_key"), $"d_name"))
    val out = BloomJoin.prunedEquiJoin(factN, "f_key", dimN, "d_key",
      expectedItems = 1000L, fpp = 0.01)
    assert(out.count() == 500)
  }
}
