package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Second TPC-H-class battery (SURVEY §2.6/§2.7): the decision-support
  * shapes the first battery (Q1/Q3/Q5/Q7/Q10 in [[Relational]]) does not
  * cover — EXISTS semi-joins, scalar correlated-aggregate subqueries,
  * disjunctive join predicates, global-scalar anti-join gates, and
  * argmax-over-aggregate — adapted to the fixture's reduced schema (no
  * commitdate/receiptdate/partsupp; see TESTDATA.md).
  *
  * Scale notes (100 TB design): every query's one wide shuffle is the
  * lineitem hash-exchange on its join/group key; part/supplier/customer
  * legs broadcast; scalar thresholds ride broadcast 1-row cross joins.
  * All money comparisons and data-dependent thresholds are integerized
  * (cents / multiplied-through inequalities) so boundary rows can never
  * flip on float summation order — the same discipline as `pop_revenue`.
  *
  * PRECONDITION for every half-up idiom here (`(x + 50) div 100`,
  * `(2s + 7) div 14`): the summed quantity is NONNEGATIVE. TPC-H money
  * amounts (extendedprice ≥ 0, 0 ≤ discount ≤ 1, quantity > 0)
  * guarantee it. On a negative aggregate the idiom is half-AWAY (the
  * +half shifts toward zero before a truncating div) AND Spark's `div`
  * (toward zero) diverges from DuckDB's `//` (floor) — so a port to
  * data with credits/returns must switch to
  * `floor((x + 50) / 100.0)`-style floor division on BOTH sides.
  */
object Tpch {

  /** TPC-H Q4-style: late-shipping order counts by priority for one
    * quarter. The classic EXISTS decorrelates to a LEFT SEMI join on
    * orderkey with the lateness predicate as the join condition; the
    * quarter filter prunes orders BEFORE the exchange, so the shuffle
    * carries one quarter of one table plus matching lineitems.
    */
  def q4Priority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = t(s, dir, "orders")
      .filter($"o_orderdate" >= to_timestamp(lit("1996-01-01 00:00:00")) &&
        $"o_orderdate" < to_timestamp(lit("1996-04-01 00:00:00")))
    val li = t(s, dir, "lineitem").select($"l_orderkey", $"l_shipdate")
    ord.join(li,
        $"l_orderkey" === $"o_orderkey" &&
          $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
  }

  /** TPC-H Q6: the forecast-revenue single-scan aggregate — the
    * canonical predicate-pushdown showcase (all three filters reach the
    * parquet scan; no join, no wide exchange, one partial-aggregated
    * row per partition). Revenue sums exact 4-decimal products as
    * DECIMAL so the one output value is partition-order independent.
    */
  def q6Forecast(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" >= to_timestamp(lit("1996-01-01 00:00:00")) &&
        $"l_shipdate" < to_timestamp(lit("1997-01-01 00:00:00")) &&
        $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
      .agg(
        sum((($"l_extendedprice" * $"l_discount").cast("decimal(18,4)")
          * 10000).cast("long")).as("rev_e4"),
        count(lit(1)).as("n_items"))
      // half-up to cents in INTEGER domain ((e4+50) div 100), then /100.0:
      // round(double, 2) on a 4dp-true value hits .xx50 ties that Spark
      // (HALF_UP on shortest rendering) and DuckDB (binary) resolve
      // differently ~1% of the time per value.
      .select((expr("(rev_e4 + 50) div 100") / 100.0).as("revenue"),
        $"n_items")
  }

  /** TPC-H Q14-style: promotion revenue share for one month. part
    * broadcasts; the conditional split is a single CASE aggregate over
    * the month's lineitems; cents-integer sums make the share division
    * the only float op.
    */
  def q14Promo(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val prt = broadcast(t(s, dir, "part").select($"p_partkey", $"p_type"))
    // price*(1-discount) is exactly 4dp, so ×10^4 → BIGINT is lossless;
    // all rounding then happens half-up in INTEGER domain (tie-exact in
    // both engines), floats appear only in the final /100.0 rendering.
    val e4 = (($"l_extendedprice" * (lit(1.0) - $"l_discount"))
      .cast("decimal(18,4)") * 10000).cast("long")
    t(s, dir, "lineitem")
      .filter($"l_shipdate" >= to_timestamp(lit("1997-03-01 00:00:00")) &&
        $"l_shipdate" < to_timestamp(lit("1997-04-01 00:00:00")))
      .join(prt, $"l_partkey" === $"p_partkey")
      .agg(
        sum(when($"p_type" === "PROMO", e4).otherwise(lit(0L)))
          .as("promo_e4"),
        sum(e4).as("total_e4"))
      .select(
        expr("(promo_e4 + 50) div 100").as("promo_cents"),
        expr("(total_e4 + 50) div 100").as("total_cents"))
      .select(
        ($"promo_cents" / 100.0).as("promo_revenue"),
        ($"total_cents" / 100.0).as("total_revenue"),
        // share% at 4dp: half-up((promo/total·100)·10^4) as an integer
        (expr("(2 * promo_cents * 1000000 + total_cents) div (2 * total_cents)")
          / 10000.0).as("promo_share"))
  }

  /** TPC-H Q15-style: the top-revenue supplier(s) for one quarter —
    * argmax over an aggregate, with ties kept (the spec's "view + max"
    * shape). Revenue is exact integer cents so the max-equality join
    * cannot miss on float drift; the 1-row max broadcasts back over the
    * supplier-revenue frame (output-sized, |suppliers| rows).
    */
  def q15TopSupp(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // price*(1-discount) is EXACTLY 4 decimal places (2dp price × 2dp
    // discount), so scaling by 10^4 before the integer cast is lossless;
    // scaling by 100 would truncate in Spark but round in DuckDB.
    val rev = t(s, dir, "lineitem")
      .filter($"l_shipdate" >= to_timestamp(lit("1996-01-01 00:00:00")) &&
        $"l_shipdate" < to_timestamp(lit("1996-04-01 00:00:00")))
      .groupBy($"l_suppkey")
      .agg(sum((($"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .cast("decimal(18,4)") * 10000).cast("long")).as("rev_e4"))
    val top = rev.agg(max($"rev_e4").as("max_e4"))
    rev.crossJoin(broadcast(top))
      .filter($"rev_e4" === $"max_e4")
      .join(broadcast(t(s, dir, "supplier").select($"s_suppkey", $"s_name")),
        $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name",
        (expr("(rev_e4 + 50) div 100") / 100.0).as("total_revenue"))
      .orderBy($"s_suppkey")
  }

  /** TPC-H Q17-style: small-quantity revenue for one brand against a
    * per-part average-quantity threshold (the scalar correlated
    * subquery). Decorrelated: per-part (sum, count) aggregate joined
    * back, with the `qty < 0.2 * avg` predicate multiplied through to
    * `5 * qty * cnt < sum` — all integer-valued, so the boundary is
    * exact in both engines regardless of division/summation order.
    * Brand keys broadcast twice (filter + threshold probe); the one
    * exchange is the per-part partial aggregate.
    */
  def q17SmallQty(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val brandKeys = broadcast(t(s, dir, "part")
      .filter($"p_brand" === "Brand#3").select($"p_partkey"))
    val li = t(s, dir, "lineitem")
      .join(brandKeys, $"l_partkey" === $"p_partkey")
      .select($"l_partkey", $"l_quantity", $"l_extendedprice")
    val perPart = li.groupBy($"l_partkey".as("t_partkey"))
      .agg(sum($"l_quantity".cast("long")).as("sum_qty"),
        count(lit(1)).as("cnt_qty"))
    li.join(broadcast(perPart), $"l_partkey" === $"t_partkey")
      .filter($"l_quantity".cast("long") * 5 * $"cnt_qty" < $"sum_qty")
      // 2dp price → exact cents via the DECIMAL path (a raw double *100
      // truncates in Spark's long cast but rounds in DuckDB's); then
      // avg_yearly cents = half-up(sum_cents/7) in INTEGER domain.
      .agg(sum(($"l_extendedprice".cast("decimal(18,2)") * 100)
        .cast("long")).as("sum_cents"),
        count(lit(1)).as("n_items"))
      .select((expr("(2 * sum_cents + 7) div 14") / 100.0).as("avg_yearly"),
        $"n_items")
  }

  /** TPC-H Q18-style: large-volume orders (per-order quantity total
    * above a threshold) with their customers. The HAVING aggregate and
    * the detail join share one hash partitioning on orderkey; customer
    * broadcasts; quantities are integers so the >300 gate is exact.
    */
  def q18BigOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val big = t(s, dir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(sum($"l_quantity".cast("long")).as("sum_qty"))
      .filter($"sum_qty" > 300)
    big.join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(t(s, dir, "customer").select($"c_custkey", $"c_name")),
        $"o_custkey" === $"c_custkey")
      // exact cents, never round(double): Spark rounds the shortest-decimal
      // rendering HALF_UP while DuckDB rounds the binary value — a .005
      // boundary flips per engine. DECIMAL(18,2)*100→long is the repo's
      // established cross-engine-exact money path.
      .select($"c_name", $"c_custkey", $"o_orderkey",
        $"o_orderdate",
        ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long")
          .as("o_total_cents"),
        $"sum_qty")
      .orderBy($"o_total_cents".desc, $"o_orderkey".asc)
      .limit(100)
  }

  /** TPC-H Q19: disjunctive brand/size/quantity predicate revenue —
    * the OR-of-conjunctions join Catalyst must NOT expand into a
    * cartesian: part broadcasts on the equi-key and the three-way OR
    * evaluates at the probe, so lineitem is scanned once, shuffle-free.
    */
  def q19Disjunct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val prt = broadcast(t(s, dir, "part")
      .select($"p_partkey", $"p_brand", $"p_size"))
    val cond =
      ($"p_brand" === "Brand#1" && $"p_size".between(1, 15) &&
        $"l_quantity".between(1, 11)) ||
      ($"p_brand" === "Brand#2" && $"p_size".between(1, 25) &&
        $"l_quantity".between(10, 20)) ||
      ($"p_brand" === "Brand#3" && $"p_size".between(1, 50) &&
        $"l_quantity".between(20, 30))
    t(s, dir, "lineitem")
      .join(prt, $"l_partkey" === $"p_partkey")
      .filter(cond)
      .agg(sum((($"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .cast("decimal(18,4)") * 10000).cast("long")).as("rev_e4"),
        count(lit(1)).as("n_items"))
      .select((expr("(rev_e4 + 50) div 100") / 100.0).as("revenue"),
        $"n_items")
  }

  /** TPC-H Q22-style: well-funded CHURNED customers (no orders since
    * 2000 — the fixture's dense FK means literally order-less customers
    * don't exist at any scale, so the idle gate is a date window) by
    * synthetic country code (custkey mod 7; no phone column). The
    * global "above-average positive balance" gate is integerized
    * (`bal_cents * n > sum_cents` — exact regardless of order), rides a
    * broadcast 1-row cross join, and the churn test is a LEFT ANTI
    * join on custkey against the date-pruned orders scan.
    */
  def q22Idle(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = t(s, dir, "customer")
      .select($"c_custkey",
        ($"c_acctbal".cast("decimal(18,2)") * 100).cast("long").as("bal_cents"))
    val thresh = cust.filter($"bal_cents" > 0)
      .agg(sum($"bal_cents").as("sum_cents"), count(lit(1)).as("n_pos"))
    cust.crossJoin(broadcast(thresh))
      .filter($"bal_cents" * $"n_pos" > $"sum_cents")
      .join(t(s, dir, "orders")
          .filter($"o_orderdate" >= to_timestamp(lit("2000-01-01 00:00:00")))
          .select($"o_custkey"),
        $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy(($"c_custkey" % 7).as("cntrycode"))
      .agg(count(lit(1)).as("n_cust"),
        round((sum($"bal_cents") / lit(100.0)).cast("double"), 2)
          .as("total_bal"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q4_priority" -> (q4Priority _),
    "q6_forecast" -> (q6Forecast _),
    "q14_promo" -> (q14Promo _),
    "q15_topsupp" -> (q15TopSupp _),
    "q17_smallqty" -> (q17SmallQty _),
    "q18_bigorders" -> (q18BigOrders _),
    "q19_disjunct" -> (q19Disjunct _),
    "q22_idle" -> (q22Idle _))

  val oracle: Map[String, String] = Map(
    "q4_priority" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority""".stripMargin,
    "q6_forecast" ->
      """WITH a AS (
        |  SELECT
        |    CAST(sum(CAST(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))
        |      * 10000 AS BIGINT)) AS BIGINT) AS rev_e4,
        |    count(*) AS n_items
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_discount >= 0.05 AND l_discount <= 0.07
        |    AND l_quantity < 24)
        |SELECT ((rev_e4 + 50) // 100) / 100.0 AS revenue, n_items
        |FROM a""".stripMargin,
    "q14_promo" ->
      """WITH m AS (
        |  SELECT p_type,
        |    CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
        |      * 10000 AS BIGINT) AS e4
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'),
        |a AS (
        |  SELECT
        |    CAST(sum(CASE WHEN p_type = 'PROMO' THEN e4 ELSE 0 END)
        |      AS BIGINT) AS promo_e4,
        |    CAST(sum(e4) AS BIGINT) AS total_e4
        |  FROM m),
        |c AS (
        |  SELECT (promo_e4 + 50) // 100 AS promo_cents,
        |         (total_e4 + 50) // 100 AS total_cents
        |  FROM a)
        |SELECT
        |  promo_cents / 100.0 AS promo_revenue,
        |  total_cents / 100.0 AS total_revenue,
        |  ((2 * promo_cents * 1000000 + total_cents) // (2 * total_cents))
        |    / 10000.0 AS promo_share
        |FROM c""".stripMargin,
    "q15_topsupp" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(CAST(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS rev_e4
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name,
        |  ((rev_e4 + 50) // 100) / 100.0 AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_e4 = (SELECT max(rev_e4) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q17_smallqty" ->
      """WITH li AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#3'),
        |pp AS (
        |  SELECT l_partkey AS t_partkey,
        |    sum(CAST(l_quantity AS BIGINT)) AS sum_qty,
        |    count(*) AS cnt_qty
        |  FROM li GROUP BY 1)
        |SELECT
        |  ((2 * CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |    AS BIGINT)) AS BIGINT) + 7) // 14) / 100.0 AS avg_yearly,
        |  count(*) AS n_items
        |FROM li JOIN pp ON l_partkey = t_partkey
        |WHERE CAST(l_quantity AS BIGINT) * 5 * cnt_qty < sum_qty""".stripMargin,
    "q18_bigorders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(CAST(l_quantity AS BIGINT)) > 300)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    AS o_total_cents, sum_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_total_cents DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "q19_disjunct" ->
      """WITH a AS (
        |  SELECT
        |  CAST(sum(CAST(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS BIGINT) AS rev_e4,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
        |    AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50
        |    AND l_quantity BETWEEN 20 AND 30))
        |SELECT ((rev_e4 + 50) // 100) / 100.0 AS revenue, n_items
        |FROM a""".stripMargin,
    "q22_idle" ->
      """WITH cust AS (
        |  SELECT c_custkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents
        |  FROM customer),
        |th AS (
        |  SELECT sum(bal_cents) AS sum_cents, count(*) AS n_pos
        |  FROM cust WHERE bal_cents > 0)
        |SELECT c_custkey % 7 AS cntrycode, count(*) AS n_cust,
        |  round(sum(bal_cents) / 100.0, 2) AS total_bal
        |FROM cust, th
        |WHERE bal_cents * n_pos > sum_cents
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY 1""".stripMargin)
}
