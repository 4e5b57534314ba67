package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.Tables.t

/** Correctness bounds for the sketch-based aggregates, which have no
  * DuckDB oracle by design (sketch internals differ across engines):
  * HLL++ distinct counts within 5% of exact, and the KLL-style
  * approximate quantile within its documented rank guarantee.
  */
class ApproxSpec extends SparkTestBase {

  test("approx_percentiles holds its rank guarantee per group at median and tails") {
    val s = spark
    import s.implicits._
    val qs = Seq(0.1, 0.5, 0.9)
    val approx = Relational.approxPercentiles(spark, sf0001)
      .collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val base = t(spark, sf0001, "orders")
      .select($"o_orderpriority", $"o_totalprice").cache()
    approx.foreach { case (prio, vals) =>
      val grp = base.filter($"o_orderpriority" === prio)
      val n = grp.count().toDouble
      // accuracy=100 bounds rank error by 1/accuracy = 1% of n; allow
      // 2% for ties at the boundary value.
      qs.zip(vals).foreach { case (q, a) =>
        val rank = grp.filter($"o_totalprice" <= a).count() / n
        assert(math.abs(rank - q) <= 0.02,
          s"priority=$prio quantile $q: approx value $a sits at rank $rank")
      }
    }
    base.unpersist()
  }

  test("approx_count_distinct within 5% of exact per return flag") {
    val s = spark
    import s.implicits._
    val approx = Relational.approxDistinct(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = t(spark, sf0001, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("exact_parts"),
        countDistinct($"l_orderkey").as("exact_orders"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    assert(approx.keySet == exact.keySet)
    for ((flag, (eParts, eOrders)) <- exact) {
      val (aParts, aOrders) = approx(flag)
      assert(math.abs(aParts - eParts).toDouble / eParts <= 0.05,
        s"flag=$flag parts: approx=$aParts exact=$eParts")
      assert(math.abs(aOrders - eOrders).toDouble / eOrders <= 0.05,
        s"flag=$flag orders: approx=$aOrders exact=$eOrders")
    }
  }
}
