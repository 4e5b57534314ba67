package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Relational battery: aggregations, joins, windows, sorts, set ops
  * (SURVEY.md §2.6/§2.7). The reference itself has no joins/aggregates —
  * these exercise the stock-Spark capabilities our engine exposes for
  * enrichment/dedup/top-k, declared in SURVEY §2.7.
  *
  * Scale notes (100 TB design): every join below either broadcasts the
  * small dimension explicitly or joins on the natural key so the shuffle
  * is a single hash partitioning on the join key; aggregates are plain
  * groupBy so Spark does partial (map-side) aggregation for free. All
  * float aggregates are rounded to fixed decimals so results are stable
  * under any partitioning / summation order.
  */
object Relational {

  /** TPC-H Q1-style scan+aggregate over lineitem. */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")), 2).as("sum_charge"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_extendedprice"), 4).as("avg_price"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** Aggregate with min/max over orders. */
  def aggOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .groupBy($"o_orderpriority", $"o_orderstatus")
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice"), 2).as("sum_price"),
        round(min($"o_totalprice"), 2).as("min_price"),
        round(max($"o_totalprice"), 2).as("max_price"),
        min($"o_orderdate").as("first_order"),
        max($"o_orderdate").as("last_order"))
  }

  /** TPC-H Q7-style: bilateral shipping volume between two trade
    * blocs (supplier nations 0-4 → customer nations 5-9) by ship
    * year; the fixture spreads nation keys uniformly, so a single
    * nation pair is vacuous at sf0.001 — blocs keep the query
    * selective AND non-empty at every gate scale. Suppliers,
    * customers, and both nation legs broadcast; the one shuffle is
    * lineitem⨝orders on orderkey, and the bloc filters apply at the
    * broadcast probes, so only qualifying rows reach the aggregate.
    */
  def q7Volume(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val suppBloc = (0 until 5).map(i => s"NATION_$i")
    val custBloc = (5 until 10).map(i => s"NATION_$i")
    val nat = t(s, dir, "nation").select($"n_nationkey", $"n_name")
    val sup = broadcast(t(s, dir, "supplier")
      .join(nat.filter($"n_name".isin(suppBloc: _*)),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("supp_nation")))
    val cus = broadcast(t(s, dir, "customer")
      .join(nat.filter($"n_name".isin(custBloc: _*)),
        $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"n_name".as("cust_nation")))
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(sup, $"l_suppkey" === $"s_suppkey")
      .join(cus, $"o_custkey" === $"c_custkey")
      .groupBy($"supp_nation", $"cust_nation", year($"l_shipdate").as("l_year"))
      // The price*(1-discount) product is exactly 4 decimal places, so
      // summing as DECIMAL(18,4) is order-independent-exact; a raw
      // double sum drifts across the 2dp rounding cell at these group
      // sizes (seen at sf0.01).
      .agg(count(lit(1)).as("n_items"),
        round(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
          .cast("decimal(18,4)")).cast("double"), 2).as("volume"))
  }

  /** TPC-H Q10-style: top returned-item revenue customers for one
    * quarter. customer and nation broadcast; the shuffle is the
    * filtered lineitem⨝orders, and the top-20 is a heap, not a sort.
    */
  def q10Returns(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nat = broadcast(t(s, dir, "nation").select($"n_nationkey", $"n_name"))
    val cus = broadcast(t(s, dir, "customer")
      .join(nat, $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"c_name", $"c_acctbal", $"n_name"))
    t(s, dir, "lineitem").filter($"l_returnflag" === "R")
      .join(t(s, dir, "orders")
        .filter($"o_orderdate" >= to_date(lit("1995-01-01")) &&
          $"o_orderdate" < to_date(lit("1995-04-01"))),
        $"l_orderkey" === $"o_orderkey")
      .join(cus, $"o_custkey" === $"c_custkey")
      .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
      .agg(round(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .cast("decimal(18,4)")).cast("double"), 2).as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey".asc)
      .limit(20)
  }

  /** Period-over-period revenue: monthly order revenue with
    * month-over-month and year-over-year deltas plus share-of-total —
    * the comparison-window OLAP staple. Revenue quantizes to integer
    * cents at the scan, so every delta is exact; share is the one
    * float division, rounded. The lag/share windows are no-partition
    * BY DESIGN: they run over the months frame (output-sized, ~100
    * rows), not orders — the orders-sized stage is one partial-
    * aggregated exchange.
    */
  def popRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val monthly = t(s, dir, "orders")
      .groupBy(trunc($"o_orderdate", "MM").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("cast(round(o_totalprice * 100, 0) as bigint)")).as("cents"))
    val w = Window.orderBy($"month")
    monthly.select($"month", $"n_orders", $"cents",
      ($"cents" - lag($"cents", 1).over(w)).as("mom_delta"),
      ($"cents" - lag($"cents", 12).over(w)).as("yoy_delta"),
      round($"cents" / sum($"cents").over(
        Window.partitionBy(lit(1))), 6).as("share"))
  }

  /** TPC-H Q3-style: 3-way join, aggregate, top-10 by revenue.
    * customer is broadcast (small dim); tiebreak on key keeps the
    * limit deterministic.
    */
  def q3TopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
    val ord = t(s, dir, "orders").filter($"o_orderdate" < to_timestamp(lit("1999-01-01 00:00:00")))
    val li = t(s, dir, "lineitem").filter($"l_shipdate" > to_timestamp(lit("1999-01-01 00:00:00")))
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey".asc)
      .limit(10)
  }

  /** TPC-H Q5-style: 5-way star join rolled up to region/nation revenue.
    * All dims (region, nation, customer) broadcast; the single shuffle
    * is lineitem⨝orders on orderkey.
    */
  def q5Region(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dims = broadcast(
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(t(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
        .select($"c_custkey", $"n_name", $"r_name"))
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(dims, $"o_custkey" === $"c_custkey")
      .groupBy($"r_name", $"n_name")
      .agg(
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Left outer join + aggregate: per-customer order stats incl. zeros. */
  def joinLeft(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(
        count($"o_orderkey").as("n_orders"),
        round(coalesce(sum($"o_totalprice"), lit(0.0)), 2).as("total_spent"))
  }

  /** Left-semi join (EXISTS): customers having a big order. */
  def joinSemi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val big = t(s, dir, "orders").filter($"o_totalprice" > 100000.0)
    t(s, dir, "customer")
      .join(big, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_mktsegment")
  }

  /** Left-anti join (NOT EXISTS): customers with no urgent order. */
  def joinAnti(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val urgent = t(s, dir, "orders").filter($"o_orderpriority" === "1-URGENT")
    t(s, dir, "customer")
      .join(urgent, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
  }

  /** Window row_number top-N per group (top-3 orders per customer). */
  def windowTopN(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
  }

  /** Distribution window functions (ntile / cume_dist / nth_value)
    * over a UNIQUE total order per partition — ties broken by the key,
    * so every row-position-dependent function is deterministic and
    * engine-exact.
    */
  def windowFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_orderstatus")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    val wFrame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice",
        ntile(4).over(w).as("quartile"),
        round(cume_dist().over(w), 6).as("cdist"),
        nth_value($"o_orderkey", 2).over(wFrame).as("second_key"))
  }

  /** GROUPING SETS — the explicit multi-level aggregate (rollup and
    * cube are its fixed shapes; this is the arbitrary-combination
    * form): (flag, status), (flag), (status), (). One pass, one
    * shuffle — Spark expands the sets map-side and aggregates all
    * levels in the same exchange.
    */
  def aggGroupingSets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupingSets(
        Seq(Seq($"l_returnflag", $"l_linestatus"), Seq($"l_returnflag"),
          Seq($"l_linestatus"), Seq()),
        $"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n_rows"),
        sum($"l_quantity".cast("decimal(18,4)")).cast("double").as("sum_qty"))
  }

  /** Window running sum over event time per user. */
  def windowRunning(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .select($"event_id", $"user_id",
        round(sum($"value").over(w), 2).as("running_value"))
  }

  /** Window lag: price delta per part over ship time. */
  def windowLag(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"l_partkey").orderBy($"l_shipdate".asc, $"l_orderkey".asc, $"l_linenumber".asc)
    t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_partkey",
        round($"l_extendedprice" - lag($"l_extendedprice", 1).over(w), 2).as("price_delta"))
  }

  /** Deterministic sort+limit (top-20 customers by balance). */
  def sortLimit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .orderBy($"c_acctbal".desc, $"c_custkey".asc)
      .limit(20)
      .select($"c_custkey", $"c_name", $"c_acctbal")
  }

  /** UNION (distinct) of two order subsets. */
  def setUnion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
    o.filter($"o_orderstatus" === "O").select($"o_orderkey")
      .union(o.filter($"o_totalprice" > 150000.0).select($"o_orderkey"))
      .distinct()
  }

  /** INTERSECT of two order subsets. */
  def setIntersect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
    o.filter($"o_orderstatus" === "O").select($"o_orderkey")
      .intersect(o.filter($"o_totalprice" > 150000.0).select($"o_orderkey"))
  }

  /** EXCEPT of two order subsets. */
  def setExcept(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
    o.filter($"o_orderstatus" === "O").select($"o_orderkey")
      .except(o.filter($"o_totalprice" > 150000.0).select($"o_orderkey"))
  }

  /** Tumbling event-time window (1 h) × event_type, routed through
    * [[graft.stream.EventWindows.tumblingByType]] — the exact function
    * the streaming path executes (StreamSpec proves batch/stream parity
    * on a MemoryStream). `window(ts,"1 hour").start` ≡
    * `date_trunc('hour', ts)`, so the ANSI oracle is unchanged.
    */
  def eventWindow(s: SparkSession, dir: String): DataFrame =
    graft.stream.EventWindows.tumblingByType(t(s, dir, "events"), "1 hour")

  /** Sliding event-time window (1 h every 30 min) via the shared
    * streaming code — each event lands in two windows.
    */
  def eventWindowSliding(s: SparkSession, dir: String): DataFrame =
    graft.stream.EventWindows.slidingByType(t(s, dir, "events"), "1 hour", "30 minutes")

  /** Session windows per user (30 min gap) via the shared streaming
    * code; oracle is the classic gaps-and-islands rewrite.
    */
  def eventSessions(s: SparkSession, dir: String): DataFrame =
    graft.stream.EventWindows.sessionByUser(t(s, dir, "events"), "30 minutes")

  /** Same sessionization through the custom-state fold
    * ([[graft.stream.StatefulSessions]], the flatMapGroupsWithState
    * path's shared core) — must agree with `event_sessions` and the
    * gaps-and-islands oracle bit-for-bit.
    */
  def eventSessionsState(s: SparkSession, dir: String): DataFrame =
    graft.stream.StatefulSessions.sessionsBatch(t(s, dir, "events"), "30 minutes")

  /** Ordered conversion funnel signup → view → click → purchase: a
    * user reaches stage k at the EARLIEST event of stage k's type at or
    * after their stage-(k-1) time (time-based ≥ semantics — row order
    * within an identical timestamp does not matter, so the result is a
    * pure function of the event times). Emits one row per stage with
    * the surviving-user count.
    *
    * Scale (the whole point of this formulation): ONE exchange of the
    * events table. Events hash-partition by user once; the three
    * chained "earliest qualifying time so far" columns are consecutive
    * RANGE-window aggregates over the SAME (user, ts) sort, so Catalyst
    * stacks them in a single Window sort without re-shuffling; the
    * per-user flag rollup then rides the same partitioning (groupBy
    * user after a user-partitioned window needs no new exchange), and
    * only 150-odd flag rows reach the final 4-row rollup. The naive
    * chained-join formulation (the DuckDB oracle, kept deliberately
    * different) shuffles events once per stage.
    */
  def eventFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val upToNow = Window.partitionBy($"user_id").orderBy($"ts")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val flags = t(s, dir, "events")
      .select($"user_id", $"event_type", $"ts")
      // Map-side: only funnel-typed events can move a stage time, so
      // nothing else needs to reach the exchange. (The oracle's WHERE
      // clauses make the same cut per stage.)
      .filter($"event_type".isin("signup", "view", "click", "purchase"))
      .withColumn("t1", min(when($"event_type" === "signup", $"ts")).over(upToNow))
      .withColumn("t2", min(when($"event_type" === "view" && $"t1".isNotNull, $"ts"))
        .over(upToNow))
      .withColumn("t3", min(when($"event_type" === "click" && $"t2".isNotNull, $"ts"))
        .over(upToNow))
      .withColumn("t4", min(when($"event_type" === "purchase" && $"t3".isNotNull, $"ts"))
        .over(upToNow))
      .groupBy($"user_id")
      .agg(
        max($"t1".isNotNull).as("s1"), max($"t2".isNotNull).as("s2"),
        max($"t3".isNotNull).as("s3"), max($"t4".isNotNull).as("s4"))
    flags.agg(
      sum(when($"s1", 1L).otherwise(0L)).as("n1"),
      sum(when($"s2", 1L).otherwise(0L)).as("n2"),
      sum(when($"s3", 1L).otherwise(0L)).as("n3"),
      sum(when($"s4", 1L).otherwise(0L)).as("n4"))
      .select(explode(array(
        struct(lit(1).as("stage"), lit("signup").as("event_type"), $"n1".as("n_users")),
        struct(lit(2).as("stage"), lit("view").as("event_type"), $"n2".as("n_users")),
        struct(lit(3).as("stage"), lit("click").as("event_type"), $"n3".as("n_users")),
        struct(lit(4).as("stage"), lit("purchase").as("event_type"), $"n4".as("n_users"))))
        .as("f"))
      .select($"f.stage", $"f.event_type", $"f.n_users")
  }

  /** Weekly cohort retention: users are cohorted by the ISO week of
    * their first event; each (cohort, week-offset) cell counts the
    * distinct cohort members active that week. Both week boundaries are
    * Monday-truncated, so the day difference is exactly divisible by 7
    * and the offset is integer-exact in any engine.
    *
    * Scale: the first-event time is a full-partition window min over
    * the single user-keyed exchange (no join back, no second shuffle of
    * events); the distinct-user rollup then exchanges only distinct
    * (cohort, offset, user) triples — bounded by users × active weeks,
    * not by event volume — with map-side partial dedup.
    */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id")
    t(s, dir, "events")
      .select($"user_id", $"ts")
      .withColumn("cohort_week", to_date(date_trunc("week", min($"ts").over(byUser))))
      .select($"user_id", $"cohort_week",
        floor(datediff(to_date(date_trunc("week", $"ts")), $"cohort_week") / 7)
          .as("week_offset"))
      .groupBy($"cohort_week", $"week_offset")
      .agg(countDistinct($"user_id").as("n_users"))
  }

  /** Per-window heavy hitters over the event props payload: for each
    * 1-day window, the `k` values covering ≥ 2% of the window's
    * events, via the same sketch-then-verify shape as the corpus-level
    * `heavy_hitters` — a Misra-Gries sketch (k=59: error ≤ N/60 <
    * N/50, so every true ≥2% item is ALWAYS a candidate) finds
    * candidates with bounded state per window, then an exact recount
    * over the candidate-filtered stream verifies with a pure-integer
    * threshold (50·n ≥ n_total). Deterministic despite merge-order-
    * dependent borderline sketch survivors — the exact filter discards
    * them.
    *
    * Scale: per (window, partition) the sketch carries ≤ k counters
    * regardless of the value cardinality; the exact pass runs only
    * over the broadcast-candidate-filtered stream. The same UDAF runs
    * unchanged inside a watermarked streaming window aggregate
    * (`MisraGriesSpec` proves the guarantee survives real streaming
    * partial merges).
    */
  def windowHeavy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events").select(
      to_date(date_trunc("day", $"ts")).as("window_start"),
      regexp_extract($"props", "\"k\": (\\d+)", 1).as("k_value"))
    val sk = ev.groupBy($"window_start").agg(
      graft.functions.MisraGriesAgg.misraGries($"k_value", 59).as("sketch"),
      count(lit(1)).as("n_total"))
    val cands = sk.select($"window_start", $"n_total", explode($"sketch").as("c"))
      .select($"window_start", $"c.item".as("k_value"), $"n_total")
    ev.join(broadcast(cands), Seq("window_start", "k_value"))
      .groupBy($"window_start", $"k_value", $"n_total")
      .agg(count(lit(1)).as("n"))
      .filter($"n" * 50 >= $"n_total")
      .select($"window_start", $"k_value", $"n")
  }

  /** Unpivot (wide→long melt) of lineitem's four measures, summarized
    * per metric. The reshape is Spark's native `unpivot` (an Expand
    * node: map-only row multiplication, no exchange); the summary is
    * one two-phase aggregate whose float sum runs through
    * decimal(18,4) so the result is identical under any partial-agg
    * order. Oracle spells the melt as a UNION ALL — an independent
    * formulation of the same reshape — with IS NOT NULL branches
    * pinning the semantics `Dataset.unpivot` applies implicitly:
    * unpivot DROPS rows whose measure value is NULL, UNION ALL keeps
    * them. TPC-H lineitem measures are non-null so the two agree here,
    * but the oracle must encode the same rule to stay truthful if a
    * nullable measure is ever unpivoted.
    */
  def unpivotStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .unpivot(
        Array($"l_orderkey"),
        Array($"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax"),
        "metric", "value")
      .groupBy($"metric")
      .agg(
        count(lit(1)).as("n_rows"),
        round(min($"value"), 4).as("v_min"),
        round(max($"value"), 4).as("v_max"),
        sum($"value".cast("decimal(18,4)")).cast("double").as("v_sum"))
  }

  /** Exact percentile aggregates (ordered-set aggregation; DuckDB
    * quantile_cont uses the same linear interpolation).
    */
  def aggPercentiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        round(expr("percentile(o_totalprice, 0.25)"), 2).as("p25"),
        round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
        round(expr("percentile(o_totalprice, 0.75)"), 2).as("p75"),
        round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"))
  }

  /** Approx distinct (HLL++) — no DuckDB oracle (sketches differ);
    * correctness asserted in graft.queries.ApproxSpec: every estimate
    * within 5% of the exact countDistinct.
    */
  def approxDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        approx_count_distinct($"l_partkey", 0.02).as("approx_parts"),
        approx_count_distinct($"l_orderkey", 0.02).as("approx_orders"))
  }

  /** Sketch-based quantiles (Greenwald-Khanna): the sort-free path a
    * 100 TB percentile dashboard takes — mergeable per-partition
    * sketches instead of a global sort. No cross-engine oracle (sketch
    * internals differ); `ApproxSpec` asserts the 1/accuracy rank
    * guarantee against exact ranks. Result is scalar columns — one per
    * requested quantile — so downstream tooling never sees an array.
    */
  def approxPercentiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .groupBy($"o_orderpriority")
      .agg(expr("percentile_approx(o_totalprice, array(0.1, 0.5, 0.9), 100)")
        .as("qs"))
      .select($"o_orderpriority",
        $"qs"(0).as("q10"), $"qs"(1).as("q50"), $"qs"(2).as("q90"))
  }

  /** ROLLUP hierarchy totals (priority → priority×status → grand). */
  def aggRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .rollup($"o_orderpriority", $"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), round(sum($"o_totalprice"), 2).as("sum_price"))
  }

  /** CUBE over the same two dimensions. */
  def aggCube(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .cube($"o_orderpriority", $"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), round(sum($"o_totalprice"), 2).as("sum_price"))
  }

  /** PIVOT order status into columns (explicit value list keeps the
    * output schema static — required for a plannable query at scale).
    */
  def pivotStatus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(round(sum($"o_totalprice"), 2))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_rollup" -> (aggRollup _),
    "agg_cube" -> (aggCube _),
    "pivot_status" -> (pivotStatus _),
    "q1_agg" -> (q1Agg _),
    "agg_orders" -> (aggOrders _),
    "pop_revenue" -> (popRevenue _),
    "q7_volume" -> (q7Volume _),
    "q10_returns" -> (q10Returns _),
    "q3_topk" -> (q3TopK _),
    "q5_region" -> (q5Region _),
    "join_left" -> (joinLeft _),
    "join_semi" -> (joinSemi _),
    "join_anti" -> (joinAnti _),
    "window_topn" -> (windowTopN _),
    "window_funcs" -> (windowFuncs _),
    "agg_gsets" -> (aggGroupingSets _),
    "window_running" -> (windowRunning _),
    "window_lag" -> (windowLag _),
    "sort_limit" -> (sortLimit _),
    "set_union" -> (setUnion _),
    "set_intersect" -> (setIntersect _),
    "set_except" -> (setExcept _),
    "event_window" -> (eventWindow _),
    "event_window_sliding" -> (eventWindowSliding _),
    "event_sessions" -> (eventSessions _),
    "event_sessions_state" -> (eventSessionsState _),
    "event_funnel" -> (eventFunnel _),
    "cohort_retention" -> (cohortRetention _),
    "unpivot_stats" -> (unpivotStats _),
    "window_heavy" -> (windowHeavy _),
    "agg_percentiles" -> (aggPercentiles _),
    "approx_distinct" -> (approxDistinct _),
    "approx_percentiles" -> (approxPercentiles _))

  /** Gaps-and-islands rewrite of 30-min-gap sessionization; shared by
    * the session_window query and its custom-state twin.
    *
    * Boundary rule (verified empirically, pinned by
    * `SessionBoundarySpec`): Spark's `session_window` MERGES touching
    * windows — an event exactly `gap` after the previous one extends
    * the session — so the break condition here is strict `>`, and the
    * custom-state fold uses the matching inclusive `<=` merge. All
    * three encodings agree on every input, including exact-boundary
    * timestamps, not just the fixture's jittered ones.
    */
  private val sessionsOracleSql: String =
    """WITH o AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |            > INTERVAL 30 MINUTE
      |    THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |g AS (
      |  SELECT user_id, ts, value,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM o)
      |SELECT min(ts) AS session_start,
      |  max(ts) + INTERVAL 30 MINUTE AS session_end,
      |  user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
      |FROM g GROUP BY user_id, sid""".stripMargin

  val oracle: Map[String, String] = Map(
    "agg_rollup" ->
      """SELECT o_orderpriority, o_orderstatus,
        | count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
        |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""".stripMargin,
    "agg_cube" ->
      """SELECT o_orderpriority, o_orderstatus,
        | count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)""".stripMargin,
    "q7_volume" ->
      """SELECT supp_nation, cust_nation, l_year, count(*) AS n_items,
        |  round(CAST(sum(CAST(volume AS DECIMAL(18,4))) AS DOUBLE), 2) AS volume
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(year(l_shipdate) AS INT) AS l_year,
        |    l_extendedprice * (1 - l_discount) AS volume
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE n1.n_name IN ('NATION_0','NATION_1','NATION_2','NATION_3','NATION_4')
        |    AND n2.n_name IN ('NATION_5','NATION_6','NATION_7','NATION_8','NATION_9'))
        |GROUP BY 1, 2, 3""".stripMargin,
    "q10_returns" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
        |    AS DOUBLE), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= DATE '1995-01-01'
        |  AND o_orderdate < DATE '1995-04-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin,
    "pop_revenue" ->
      """WITH m AS (
        |  SELECT date_trunc('month', o_orderdate) AS month,
        |    count(*) AS n_orders,
        |    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1)
        |SELECT CAST(month AS DATE) AS month, n_orders, cents,
        |  cents - lag(cents, 1) OVER (ORDER BY month) AS mom_delta,
        |  cents - lag(cents, 12) OVER (ORDER BY month) AS yoy_delta,
        |  round(cents / CAST(sum(cents) OVER () AS BIGINT), 6) AS share
        |FROM m""".stripMargin,
    "pivot_status" ->
      """SELECT o_orderpriority,
        | round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS F,
        | round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS O,
        | round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS P
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_extendedprice), 4) AS avg_price,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "agg_orders" ->
      """SELECT o_orderpriority, o_orderstatus,
        | count(*) AS n_orders,
        | round(sum(o_totalprice), 2) AS sum_price,
        | round(min(o_totalprice), 2) AS min_price,
        | round(max(o_totalprice), 2) AS max_price,
        | min(o_orderdate) AS first_order,
        | max(o_orderdate) AS last_order
        |FROM orders GROUP BY o_orderpriority, o_orderstatus""".stripMargin,
    "q3_topk" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q5_region" ->
      """SELECT r_name, n_name,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "join_left" ->
      """SELECT c_custkey,
        | count(o_orderkey) AS n_orders,
        | round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')""".stripMargin,
    "window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "window_funcs" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        | CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        | round(cume_dist() OVER w, 6) AS cdist,
        | nth_value(o_orderkey, 2) OVER (PARTITION BY o_orderstatus
        |   ORDER BY o_totalprice DESC, o_orderkey ASC
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        |  ORDER BY o_totalprice DESC, o_orderkey ASC)""".stripMargin,
    "agg_gsets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), (l_linestatus), ())""".stripMargin,
    "window_running" ->
      """SELECT event_id, user_id,
        | round(sum(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
        |FROM events""".stripMargin,
    "window_lag" ->
      """SELECT l_orderkey, l_linenumber, l_partkey,
        | round(l_extendedprice - lag(l_extendedprice, 1) OVER (
        |   PARTITION BY l_partkey ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC), 2) AS price_delta
        |FROM lineitem""".stripMargin,
    "sort_limit" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 20""".stripMargin,
    "set_union" ->
      """SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O'
        |UNION
        |SELECT o_orderkey FROM orders WHERE o_totalprice > 150000""".stripMargin,
    "set_intersect" ->
      """SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT
        |SELECT o_orderkey FROM orders WHERE o_totalprice > 150000""".stripMargin,
    "set_except" ->
      """SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT
        |SELECT o_orderkey FROM orders WHERE o_totalprice > 150000""".stripMargin,
    "event_window" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        | count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "event_window_sliding" ->
      """WITH w AS (
        |  SELECT event_type, value,
        |    ((floor(epoch(ts))::BIGINT // 1800) - i) * 1800 AS start_s
        |  FROM events CROSS JOIN range(2) r(i)
        |  WHERE epoch(ts) < ((floor(epoch(ts))::BIGINT // 1800) - i) * 1800 + 3600)
        |SELECT make_timestamp(start_s * 1000000) AS window_start,
        |  make_timestamp((start_s + 3600) * 1000000) AS window_end,
        |  event_type, count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM w GROUP BY 1, 2, 3""".stripMargin,
    "event_sessions" -> sessionsOracleSql,
    // Same sessions, computed by the custom-state fold — one SQL truth.
    "event_sessions_state" -> sessionsOracleSql,
    // Deliberately the NAIVE chained-join formulation (one join per
    // stage) — an independent derivation of the single-shuffle window
    // funnel. The e CTE truncates the nanosecond timestamps to micros
    // exactly as graft.Tables does, so the >= comparisons agree.
    "event_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
        |    make_timestamp(epoch_ns(ts) // 1000) AS ts FROM events),
        |s1 AS (SELECT user_id, min(ts) AS t1 FROM e
        |       WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'view' AND e.ts >= s1.t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM e JOIN s2 USING (user_id)
        |       WHERE event_type = 'click' AND e.ts >= s2.t2 GROUP BY 1),
        |s4 AS (SELECT e.user_id, min(e.ts) AS t4 FROM e JOIN s3 USING (user_id)
        |       WHERE event_type = 'purchase' AND e.ts >= s3.t3 GROUP BY 1)
        |SELECT 1 AS stage, 'signup' AS event_type, count(*) AS n_users FROM s1
        |UNION ALL SELECT 2, 'view', count(*) FROM s2
        |UNION ALL SELECT 3, 'click', count(*) FROM s3
        |UNION ALL SELECT 4, 'purchase', count(*) FROM s4""".stripMargin,
    // Exact truth: group counts + the same pure-integer 5% threshold.
    "window_heavy" ->
      """WITH e AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS window_start,
        |    regexp_extract(props, '"k": (\d+)', 1) AS k_value FROM events),
        |t AS (SELECT window_start, count(*) AS n_total FROM e GROUP BY 1)
        |SELECT e.window_start, e.k_value, count(*) AS n
        |FROM e JOIN t USING (window_start)
        |GROUP BY e.window_start, e.k_value, t.n_total
        |HAVING count(*) * 50 >= t.n_total""".stripMargin,
    "unpivot_stats" ->
      """WITH u AS (
        |  SELECT 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        |    WHERE l_quantity IS NOT NULL
        |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |    WHERE l_extendedprice IS NOT NULL
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |    WHERE l_discount IS NOT NULL
        |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem
        |    WHERE l_tax IS NOT NULL)
        |SELECT metric, count(*) AS n_rows,
        |  round(min(value), 4) AS v_min, round(max(value), 4) AS v_max,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v_sum
        |FROM u GROUP BY 1""".stripMargin,
    "cohort_retention" ->
      """WITH f AS (SELECT user_id,
        |    CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        |  FROM events GROUP BY 1)
        |SELECT f.cohort_week,
        |  date_diff('day', f.cohort_week,
        |    CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS week_offset,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM events e JOIN f USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "agg_percentiles" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        | round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
        | round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        | round(quantile_cont(o_totalprice, 0.75), 2) AS p75,
        | round(quantile_cont(o_totalprice, 0.9), 2) AS p90
        |FROM orders GROUP BY o_orderpriority""".stripMargin)
}
