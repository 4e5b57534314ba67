package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Temporal battery: time-series regularization (resample / gap-fill /
  * LOCF / interpolation) and event-time range-frame windows — the two
  * window shapes the rest of the suite doesn't cover (spine-joined
  * buckets and RANGE BETWEEN frames vs the ROWS frames of
  * `window_running`).
  */
object Temporal {

  /** 6-hour buckets: sparse enough on the fixture (~2 events/user/day)
    * that interior gaps actually occur, so LOCF and interpolation are
    * exercised on real holes, not degenerate dense series.
    */
  private val BucketMicros = 6L * 3600 * 1000000

  private val DayMicros = 24L * 3600 * 1000000

  def tsGapfill(s: SparkSession, dir: String): DataFrame =
    graft.ext.TimeSeries.gapfill(
      t(s, dir, "events"), "user_id", "ts", "value", "event_id", BucketMicros)

  /** Trailing 24h event-time window per user: RANGE frame over
    * event-time micros, so the frame is defined by TIME, not row
    * count — simultaneous events all enter together and quiet periods
    * shrink the frame. Sums are exact integer cents.
    *
    * Scale shape: one exchange on user_id; the range frame is a single
    * sort-based window pass (no self-join against a time predicate,
    * which is the naive O(n²) rewrite).
    */
  def tsRolling(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(ts)").as("tus"),
        expr("cast(round(value * 100, 0) as bigint)").as("cents"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"))
      .rangeBetween(-DayMicros, 0)
    e.select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_24h"),
        sum(col("cents")).over(w).as("cents_24h"))
  }

  /** Rolling anomaly gate: flag events whose value sits more than 3
    * sample-ish sigmas from their key's trailing-24h history — the
    * streaming-adjacent data-quality monitor, expressed batch-side.
    *
    * Exactness: the z² test is cross-multiplied into pure BIGINT
    * arithmetic — (v·n − s1)² > 9·(n·s2 − s1²) — over integer cents,
    * so there is no float anywhere (same trick as numeric_outliers,
    * composed here with the event-time RANGE frame). The frame is
    * [−24h, −1µs]: strictly-prior history, so an event never judges
    * itself. Output is bounded by true anomalies, not events.
    */
  def tsAnomaly(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(ts)").as("tus"),
        expr("cast(round(value * 100, 0) as bigint)").as("cents"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"))
      .rangeBetween(-DayMicros, -1)
    val n = count(lit(1)).over(w)
    val s1 = sum(col("cents")).over(w)
    val s2 = sum(col("cents") * col("cents")).over(w)
    val num = (col("cents") * col("n") - col("s1")) *
      (col("cents") * col("n") - col("s1"))
    val den = col("n") * col("s2") - col("s1") * col("s1")
    e.select(col("event_id"), col("user_id"), col("cents"),
        n.as("n"), s1.as("s1"), s2.as("s2"))
      .filter(col("n") >= 5 && den > 0 && num > lit(9L) * den)
      .select(col("event_id"), col("user_id"), col("cents"),
        col("n").as("n_prior"), num.as("zsq_num"), den.as("zsq_den"))
  }

  /** Behavioral path analysis: the per-user event-type transition
    * matrix — counts and transition probabilities for every observed
    * (previous type → type) step, ordered by event time within user.
    * Completes the funnel/retention/paths product-analytics trio.
    *
    * Exactness: counts are integers; the probability is ONE double
    * division per row, rounded to 6 — numerator and denominator both
    * exact. Shape: one exchange for the lag window (per-user, on the
    * narrow 3-column frame), one for the pair aggregate; the
    * transition matrix is |types|² regardless of input size.
    */
  def eventTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val pairs = t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .select(col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w2 = Window.partitionBy(col("prev_type"))
    pairs.select(col("prev_type"), col("event_type"), col("n"),
      round(col("n") / sum(col("n")).over(w2), 6).as("p"))
  }

  /** Inter-arrival distribution: log2-bucketed histogram of the gaps
    * between a user's consecutive events — the burstiness / bot-rhythm
    * profile (near-constant machine cadence collapses into one or two
    * buckets; human traffic spreads). The bucket is INTEGER-exact on
    * both engines: length(bin(delta_micros)) = floor(log2)+1, no
    * float log whose power-of-two boundaries could misround. One
    * exchange for the per-user lag, one for the ~50-row histogram.
    */
  def interarrivalHist(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("unix_micros(ts)").as("tus"))
      .select((col("tus") - lag(col("tus"), 1).over(w)).as("delta_us"))
      .filter(col("delta_us").isNotNull)
      .select(length(bin(col("delta_us"))).cast("int").as("log2_bucket"),
        col("delta_us"))
      .groupBy(col("log2_bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("delta_us")).as("min_us"), max(col("delta_us")).as("max_us"))
  }

  /** Rolling distinct actives — DAU and trailing-7-day WAU per day,
    * EXACT (no sketch). Distinct-over-sliding-window doesn't compose
    * from window frames (distinct isn't sum-decomposable); the scale
    * shape is contribution explosion: dedup (user, day) presence, each
    * presence row contributes to its 7 target days, dedup (user,
    * target) again, count. Three bounded exchanges over presence
    * frames (users × days, not events); the raw event stream is
    * reduced in the FIRST aggregate. Target days are restricted to
    * observed days (the spine is the data's own day set).
    */
  def rollingActives(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val days = p.select(col("d")).distinct()
    val dau = p.groupBy(col("d")).agg(count(lit(1)).as("dau"))
    val wau = p
      .select(col("user_id"),
        explode(sequence(col("d"), date_add(col("d"), 6))).as("d"))
      .distinct()
      .join(days, Seq("d"), "left_semi")
      .groupBy(col("d")).agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("d"))
      .select(col("d").as("day"), col("dau"), col("wau"),
        // Stickiness (DAU/WAU): one double division of exact longs.
        round(col("dau") / col("wau"), 6).as("stickiness"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rolling_actives" -> (rollingActives _),
    "interarrival_hist" -> (interarrivalHist _),
    "event_transitions" -> (eventTransitions _),
    "ts_gapfill" -> (tsGapfill _),
    "ts_rolling" -> (tsRolling _),
    "ts_anomaly" -> (tsAnomaly _))

  val oracle: Map[String, String] = Map(
    // The BETWEEN self-join formulation the engine's explosion avoids.
    "rolling_actives" ->
      """WITH p AS (
        |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
        |  FROM events),
        |days AS (SELECT DISTINCT d FROM p),
        |wau AS (
        |  SELECT days.d, count(DISTINCT p.user_id) AS wau
        |  FROM days JOIN p ON p.d BETWEEN days.d - 6 AND days.d
        |  GROUP BY 1),
        |dau AS (SELECT d, count(*) AS dau FROM p GROUP BY 1)
        |SELECT dau.d AS day, dau, wau,
        |  round(dau / wau, 6) AS stickiness
        |FROM dau JOIN wau ON dau.d = wau.d""".stripMargin,
    "interarrival_hist" ->
      """WITH d AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) -
        |    lag(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER (
        |      PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC) AS delta_us
        |  FROM events)
        |SELECT CAST(len(bin(delta_us)) AS INT) AS log2_bucket,
        |  count(*) AS n,
        |  CAST(min(delta_us) AS BIGINT) AS min_us,
        |  CAST(max(delta_us) AS BIGINT) AS max_us
        |FROM d WHERE delta_us IS NOT NULL
        |GROUP BY 1""".stripMargin,
    "event_transitions" ->
      """WITH q AS (
        |  SELECT event_type,
        |    lag(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC) AS prev_type
        |  FROM events),
        |c AS (
        |  SELECT prev_type, event_type, count(*) AS n FROM q
        |  WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, event_type, n,
        |  round(n / CAST(sum(n) OVER (PARTITION BY prev_type) AS BIGINT), 6) AS p
        |FROM c""".stripMargin,
    "ts_gapfill" -> graft.ext.TimeSeries.gapfillOracleSql(BucketMicros),
    "ts_rolling" ->
      s"""SELECT event_id, user_id,
         |  count(*) OVER w AS n_24h,
         |  CAST(sum(cents) OVER w AS BIGINT) AS cents_24h
         |FROM (
         |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
         |    CAST(round(value * 100, 0) AS BIGINT) AS cents
         |  FROM events)
         |WINDOW w AS (PARTITION BY user_id ORDER BY tus
         |  RANGE BETWEEN $DayMicros PRECEDING AND CURRENT ROW)""".stripMargin,
    "ts_anomaly" ->
      s"""WITH e AS (
         |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
         |    CAST(round(value * 100, 0) AS BIGINT) AS cents
         |  FROM events),
         |s AS (
         |  SELECT event_id, user_id, cents,
         |    count(*) OVER w AS n,
         |    CAST(sum(cents) OVER w AS BIGINT) AS s1,
         |    CAST(sum(cents * cents) OVER w AS BIGINT) AS s2
         |  FROM e
         |  WINDOW w AS (PARTITION BY user_id ORDER BY tus
         |    RANGE BETWEEN $DayMicros PRECEDING AND 1 PRECEDING))
         |SELECT event_id, user_id, cents, n AS n_prior,
         |  (cents * n - s1) * (cents * n - s1) AS zsq_num,
         |  n * s2 - s1 * s1 AS zsq_den
         |FROM s
         |WHERE n >= 5 AND n * s2 - s1 * s1 > 0
         |  AND (cents * n - s1) * (cents * n - s1) > 9 * (n * s2 - s1 * s1)""".stripMargin)
}
