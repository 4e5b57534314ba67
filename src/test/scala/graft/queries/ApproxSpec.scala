package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.Tables.t

/** Correctness bound for the HLL++ sketch query (`approx_distinct`),
  * which has no DuckDB oracle by design (sketch internals differ across
  * engines). Asserts every estimate is within 5% of the exact
  * countDistinct on the same grouping.
  */
class ApproxSpec extends SparkTestBase {

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
