package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Structural invariants of the second TPC-H battery beyond the oracle
  * hash gate: each query's defining predicate is re-checked against an
  * independently-shaped plan, so a hash match can never hide a
  * decorrelation bug (the EXISTS/scalar-subquery rewrites are ours, not
  * Catalyst's).
  */
class TpchSpec extends SparkTestBase {
  import spark.implicits._

  private def li = spark.read.parquet(s"$sf0001/lineitem.parquet")
  private def ord = spark.read.parquet(s"$sf0001/orders.parquet")

  test("q4: semi-join counts equal the distinct-orderkey decorrelation") {
    val got = Tpch.q4Priority(spark, sf0001)
      .agg(sum("n_orders")).head().getLong(0)
    // Independent shape: inner join + distinct orderkey, not semi.
    val expect = ord
      .filter($"o_orderdate" >= "1996-01-01" && $"o_orderdate" < "1996-04-01")
      .join(li.select($"l_orderkey", $"l_shipdate"),
        $"l_orderkey" === $"o_orderkey" &&
          $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 30 DAYS"))
      .select($"o_orderkey").distinct().count()
    assert(got === expect)
    assert(got > 0, "quarter gate must not be vacuous at sf0.001")
  }

  test("q6: integerized revenue matches the cents recomputation") {
    val row = Tpch.q6Forecast(spark, sf0001).head()
    val cents = li
      .filter($"l_shipdate" >= "1996-01-01" && $"l_shipdate" < "1997-01-01" &&
        $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
      .agg(sum((($"l_extendedprice" * $"l_discount")
        .cast("decimal(18,4)") * 10000).cast("long")))
      .head().getLong(0)
    assert(math.abs(row.getDouble(0) - math.round(cents / 100.0) / 100.0) < 1e-9)
    assert(row.getLong(1) > 0)
  }

  test("q15: every returned supplier carries the global max revenue") {
    val rows = Tpch.q15TopSupp(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getDouble(2)).distinct.length === 1,
      "ties must all be at the max")
  }

  test("q17: integerized threshold equals the rational predicate") {
    val n = Tpch.q17SmallQty(spark, sf0001).head().getLong(1)
    // Rational form qty < 0.2 * sum/cnt, evaluated with exact integers
    // via BigDecimal to dodge double division entirely.
    val brand = spark.read.parquet(s"$sf0001/part.parquet")
      .filter($"p_brand" === "Brand#3").select($"p_partkey")
    val rows = li.join(brand, $"l_partkey" === $"p_partkey")
      .select($"l_partkey", $"l_quantity").collect()
      .map(r => (r.getLong(0), r.getDouble(1).toLong))
    val byPart = rows.groupBy(_._1)
    val expect = rows.count { case (p, q) =>
      val qs = byPart(p).map(_._2); q * 5 * qs.length < qs.sum
    }
    assert(n === expect)
  }

  test("q18: every row's quantity total is >300 and recomputes exactly") {
    val got = Tpch.q18BigOrders(spark, sf0001)
      .select($"o_orderkey", $"sum_qty").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.forall(_ > 300))
    val re = li.groupBy($"l_orderkey")
      .agg(sum($"l_quantity".cast("long")).as("q"))
      .filter($"l_orderkey".isin(got.keys.toSeq: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re === got)
  }

  test("q22: result customers are churned and clear the mean gate") {
    val custs = spark.read.parquet(s"$sf0001/customer.parquet")
      .select($"c_custkey",
        ($"c_acctbal".cast("decimal(18,2)") * 100).cast("long").as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pos = custs.map(_._2).filter(_ > 0)
    val (sumC, nPos) = (pos.sum, pos.length.toLong)
    val recent = ord.filter($"o_orderdate" >= "2000-01-01")
      .select($"o_custkey").distinct()
      .collect().map(_.getLong(0)).toSet
    val expectIdle = custs.filter { case (k, b) =>
      b * nPos > sumC && !recent.contains(k)
    }
    val got = Tpch.q22Idle(spark, sf0001)
      .agg(sum("n_cust")).head().getLong(0)
    assert(got === expectIdle.length.toLong)
    assert(got > 0, "gate must not be vacuous at sf0.001")
  }
}
