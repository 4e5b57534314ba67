package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Analytics battery: graph centrality, association rules, conversion
  * latency, categorical forensics, and the deterministic ML split —
  * the layer a curation team runs ON TOP of the dedup/quality/sampling
  * primitives the other batteries provide.
  *
  * Exactness discipline (same as [[Temporal]]): every recurrence and
  * test statistic is either pure BIGINT arithmetic or a single IEEE
  * double operation on exactly-representable integers, so the DuckDB
  * oracle replays it bit-for-bit.
  */
object Analytics {

  /** Rank mass per node in "nano-rank" units. Small enough that
    * 85 × (total mass) stays far inside BIGINT at any plausible node
    * count (2e8 nodes × 1e9 × 85 ≈ 1.7e19 is the ceiling; co-purchase
    * graphs at 100 TB sit orders of magnitude below it because a
    * single node can't absorb all mass), large enough that the
    * per-edge floor division `r div deg` keeps ~1e6 resolution at
    * realistic degrees.
    */
  private val InitNano = 1000000000L
  private val BaseNano = 150000000L // (1 − 0.85) × InitNano
  private val PrIters = 3

  /** PageRank over the co-purchase graph, INTEGER-exact: the damped
    * recurrence r' = 0.15·m + 0.85·Σ r/deg is rewritten in nano-rank
    * BIGINT units with floor division — `base + (85 · Σ (r div deg))
    * div 100` — so every iteration is order-independent integer
    * arithmetic and the DuckDB oracle unrolls the SAME recurrence
    * step-for-step (a float PageRank could never hash-match: its sums
    * are association-order-dependent). Fixed [[PrIters]] iterations;
    * convergence tuning is a deployment knob, determinism is the
    * contract here.
    *
    * Scale shape: edges are the support-filtered co-purchase pairs
    * (sparse — bounded by true associations, never lineitem²), made
    * bidirectional so every node has out-degree ≥ 1 (no dangling-mass
    * term). The static (src, dst, deg) frame is localCheckpoint'd once
    * and reused by every iteration — lineage truncation keeps
    * iteration i from re-mining pairs i times (the same trick as
    * [[graft.ext.NearDup]]'s label propagation); each iteration is
    * then ONE key-keyed exchange (join ranks on src) + one partial
    * aggregated exchange (sum by dst). On a real cluster both sides
    * would be co-partitioned on node id so the per-iteration join is
    * exchange-free; at fixture scale the shape is the same minus the
    * persisted partitioning.
    */
  def pagerank(s: SparkSession, dir: String): DataFrame =
    pagerankOnPairs(ScaleOps.copurchasePairs(s, dir)
      .select(col("part_a"), col("part_b")))

  /** The recurrence over an arbitrary undirected pair list — split out
    * so the spec can replay it against an in-driver reference on a
    * hand-built graph.
    */
  def pagerankOnPairs(p: DataFrame): DataFrame = {
    val edges = p.select(col("part_a").as("src"), col("part_b").as("dst"))
      .union(p.select(col("part_b").as("src"), col("part_a").as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val withDeg = edges.join(deg, "src").localCheckpoint()
    var ranks = deg.select(col("src").as("node"), lit(InitNano).as("r"))
    for (_ <- 1 to PrIters) {
      ranks = withDeg.join(ranks, withDeg("src") === ranks("node"))
        .select(col("dst"), expr("r div d").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("sc"))
        .select(col("dst").as("node"),
          (lit(BaseNano) + expr("(85 * sc) div 100")).as("r"))
    }
    ranks.select(col("node"), col("r").as("rank_nano"))
  }

  /** Association rules from the co-purchase pairs: for every supported
    * pair, both directed rules a→b and b→a with confidence
    * n_ab / n_a and lift n_ab·N / (n_a·n_b) — the market-basket
    * staple one rung up from raw pair mining. All counts are exact
    * integers (pair support, single-item order support, basket count);
    * confidence and lift are each ONE double division of
    * exactly-representable products, rounded to 6.
    *
    * Scale shape: item supports are one partial-aggregated exchange
    * over the distinct (order, part) frame; the rule build joins the
    * SPARSE pair list to the item-count frame twice (antecedent,
    * consequent) — both joins are bounded by true pairs. The basket
    * count N rides a broadcast 1-row cross join (the suite's standard
    * scalar shape).
    */
  def assocRules(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val nOrders = p.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val item = p.groupBy(col("l_partkey")).agg(count(lit(1)).as("n_item"))
    val pairs = ScaleOps.copurchasePairs(s, dir)
    val directed = pairs
      .select(col("part_a").as("antecedent"), col("part_b").as("consequent"),
        col("support"))
      .union(pairs.select(col("part_b"), col("part_a"), col("support")))
    directed
      .join(item.select(col("l_partkey").as("antecedent"),
        col("n_item").as("n_ant")), "antecedent")
      .join(item.select(col("l_partkey").as("consequent"),
        col("n_item").as("n_con")), "consequent")
      .crossJoin(broadcast(nOrders))
      .select(col("antecedent"), col("consequent"), col("support"),
        round(col("support") / col("n_ant"), 6).as("confidence"),
        round((col("support") * col("n_orders")) /
          (col("n_ant") * col("n_con")), 6).as("lift"))
  }

  /** Conversion latency: per user, the gap between the FIRST 'view'
    * and the first 'purchase' strictly after it, log2-bucketed into
    * the same integer-exact histogram as `interarrival_hist`
    * (length(bin(Δµs)) — no float log near power-of-two boundaries).
    * Completes the funnel → retention → transition → LATENCY
    * product-analytics set: the funnel says who converts, this says
    * how fast.
    *
    * Scale shape: two partial-aggregated exchanges (first view per
    * user; first qualifying purchase per user) joined on user_id —
    * the same single key, so a co-partitioned layout runs it in one
    * exchange — then a ~60-row histogram aggregate.
    */
  def conversionLag(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("tus"))
    val fv = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("tus")).as("fv_us"))
    e.filter(col("event_type") === "purchase")
      .join(fv, "user_id")
      .filter(col("tus") > col("fv_us"))
      .groupBy(col("user_id"), col("fv_us"))
      .agg(min(col("tus")).as("fp_us"))
      .select((col("fp_us") - col("fv_us")).as("delta_us"))
      .select(length(bin(col("delta_us"))).cast("int").as("log2_bucket"),
        col("delta_us"))
      .groupBy(col("log2_bucket"))
      .agg(count(lit(1)).as("n_users"),
        min(col("delta_us")).as("min_us"), max(col("delta_us")).as("max_us"))
  }

  /** Chi-square independence audit: region × order-priority — the
    * categorical companion to the Benford digit screen (`benford_
    * digits`): does a nominal attribute distribute independently of a
    * segment, or is there structure/fabrication? Emits the full
    * contingency diagnostics per cell plus the cell's χ² contribution.
    *
    * Exactness: observed / row / column / grand totals are exact
    * BIGINTs (windows over the |cells|-sized aggregate, never the
    * fact table); the cell statistic is computed as
    * (O·N − row·col)² / (N·row·col) — diff is an exact BIGINT, and
    * the square/divide are two IEEE double ops on it, bit-identical
    * across engines, rounded to 6. The textbook (O−E)²/E with float
    * E would round differently per engine; this cross-multiplied form
    * never materializes E.
    *
    * Scale shape: dimensions broadcast into the fact scan, ONE
    * partial-aggregated exchange to the |regions × priorities| cell
    * frame; the three total windows run over that output-sized frame
    * (no-partition by design — 25 rows).
    */
  def chiSquare(s: SparkSession, dir: String): DataFrame = {
    val cells = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")
        .select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("o_orderpriority"))
      .agg(count(lit(1)).as("obs"))
    val wr = Window.partitionBy(col("r_name"))
    val wc = Window.partitionBy(col("o_orderpriority"))
    val wAll = Window.partitionBy()
    val withTotals = cells.select(col("r_name"), col("o_orderpriority"),
      col("obs"),
      sum(col("obs")).over(wr).as("row_n"),
      sum(col("obs")).over(wc).as("col_n"),
      sum(col("obs")).over(wAll).as("n_total"))
    val diff = col("obs") * col("n_total") - col("row_n") * col("col_n")
    withTotals.select(col("r_name"), col("o_orderpriority"), col("obs"),
      col("row_n"), col("col_n"), col("n_total"),
      round((diff.cast("double") * diff.cast("double")) /
        (col("n_total") * col("row_n") * col("col_n")).cast("double"), 6)
        .as("chi2_cell"))
  }

  /** Deterministic train/val/test split over the document corpus —
    * the last step before training data leaves the pipeline. The
    * assignment is a pure-arithmetic hash of the STABLE key
    * (h = (doc_id·1103515245 + 12345) mod 2³¹, split = h mod 10 →
    * 8/1/1), so membership is a function of the row, not of row
    * order, partitioning, or corpus size: re-running on a grown
    * corpus never moves an old document across splits (a row_number
    * split would reshuffle everything). Emits per split × source
    * counts, char mass, and id ranges — the audit frame that proves
    * the split is disjoint and complete (Σ n_docs = corpus).
    *
    * Scale shape: map-only assignment (no exchange touches the text),
    * one partial-aggregated exchange to the |splits × sources| frame.
    */
  def dataSplit(s: SparkSession, dir: String): DataFrame = {
    val h = (col("doc_id") * lit(1103515245L) + lit(12345L)) % lit(2147483648L)
    val bucket = h % 10
    t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"),
        when(bucket < 8, "train").when(bucket === 8, "val")
          .otherwise("test").as("split"))
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pagerank" -> (pagerank _),
    "assoc_rules" -> (assocRules _),
    "conversion_lag" -> (conversionLag _),
    "chi_square" -> (chiSquare _),
    "data_split" -> (dataSplit _))

  /** Shared CTE prefix: distinct basket items and the support-filtered
    * co-purchase pair list (the same formulation as the
    * `copurchase_pairs` oracle).
    */
  private val PairCtes =
    """WITH p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |pr AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS support
      |  FROM p a JOIN p b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= 2)""".stripMargin

  /** One unrolled PageRank step in the oracle's integer recurrence.
    * `sum` returns HUGEINT in DuckDB, so the damped term is computed
    * in 128-bit and cast back — same values as Spark's BIGINT path,
    * which [[InitNano]] keeps far from overflow.
    */
  private def prStep(prev: String, next: String): String =
    s"""$next AS (
       |  SELECT e.dst AS node,
       |    CAST($BaseNano + (85 * sum($prev.r // deg.d)) // 100 AS BIGINT) AS r
       |  FROM e JOIN deg ON e.src = deg.src JOIN $prev ON $prev.node = e.src
       |  GROUP BY e.dst)""".stripMargin

  val oracle: Map[String, String] = Map(
    "pagerank" ->
      s"""$PairCtes,
         |e AS (SELECT pa AS src, pb AS dst FROM pr
         |      UNION ALL SELECT pb, pa FROM pr),
         |deg AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
         |r0 AS (SELECT src AS node, CAST($InitNano AS BIGINT) AS r FROM deg),
         |${prStep("r0", "r1")},
         |${prStep("r1", "r2")},
         |${prStep("r2", "r3")}
         |SELECT node, r AS rank_nano FROM r3""".stripMargin,
    "assoc_rules" ->
      s"""$PairCtes,
         |item AS (SELECT l_partkey, count(*) AS n_item FROM p GROUP BY 1),
         |n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM p),
         |d AS (
         |  SELECT pa AS antecedent, pb AS consequent, support FROM pr
         |  UNION ALL
         |  SELECT pb, pa, support FROM pr)
         |SELECT antecedent, consequent, support,
         |  round(support / ia.n_item, 6) AS confidence,
         |  round((support * n_orders) / (ia.n_item * ic.n_item), 6) AS lift
         |FROM d
         |JOIN item ia ON ia.l_partkey = antecedent
         |JOIN item ic ON ic.l_partkey = consequent
         |CROSS JOIN n""".stripMargin,
    "conversion_lag" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS tus
        |  FROM events),
        |fv AS (
        |  SELECT user_id, min(tus) AS fv_us FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |conv AS (
        |  SELECT e.user_id, fv.fv_us, min(e.tus) AS fp_us
        |  FROM e JOIN fv ON e.user_id = fv.user_id
        |  WHERE e.event_type = 'purchase' AND e.tus > fv.fv_us
        |  GROUP BY 1, 2)
        |SELECT CAST(len(bin(fp_us - fv_us)) AS INT) AS log2_bucket,
        |  count(*) AS n_users,
        |  CAST(min(fp_us - fv_us) AS BIGINT) AS min_us,
        |  CAST(max(fp_us - fv_us) AS BIGINT) AS max_us
        |FROM conv
        |GROUP BY 1""".stripMargin,
    "chi_square" ->
      """WITH cells AS (
        |  SELECT r_name, o_orderpriority, count(*) AS obs
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2),
        |tot AS (
        |  SELECT r_name, o_orderpriority, obs,
        |    CAST(sum(obs) OVER (PARTITION BY r_name) AS BIGINT) AS row_n,
        |    CAST(sum(obs) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS col_n,
        |    CAST(sum(obs) OVER () AS BIGINT) AS n_total
        |  FROM cells)
        |SELECT r_name, o_orderpriority, obs, row_n, col_n, n_total,
        |  round(
        |    (CAST(obs * n_total - row_n * col_n AS DOUBLE) *
        |     CAST(obs * n_total - row_n * col_n AS DOUBLE)) /
        |    CAST(n_total * row_n * col_n AS DOUBLE), 6) AS chi2_cell
        |FROM tot""".stripMargin,
    "data_split" ->
      """WITH a AS (
        |  SELECT doc_id, source, n_chars,
        |    CASE WHEN (doc_id * 1103515245 + 12345) % 2147483648 % 10 < 8
        |           THEN 'train'
        |         WHEN (doc_id * 1103515245 + 12345) % 2147483648 % 10 = 8
        |           THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM a
        |GROUP BY 1, 2""".stripMargin)
}
