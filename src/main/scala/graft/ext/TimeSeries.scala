package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: fixed-interval resampling with gap
  * filling, last-observation-carried-forward, and linear interpolation
  * (reference scope: the analytics engine's event tables; resampling is
  * the canonical prep step the reference leaves to its warehouse).
  *
  * Execution shape at 100 TB:
  *   1. The raw event stream is reduced FIRST — one hash aggregate on
  *      (key, bucket) with map-side partial combine, so the full-size
  *      input crosses the wire once, already bucketized (everything
  *      downstream is bounded by keys × observed buckets, not events).
  *   2. Gap rows are GENERATED, not joined: each observed bucket
  *      explodes `sequence(idx, next_idx - 1)` — itself plus the gap
  *      buckets up to the key's next observation (`lead` over one
  *      key-partitioned window). No independent spine materializes, no
  *      spine join, and the raw input is scanned exactly once; the
  *      whole pipeline is two exchanges (one carrying bucketized
  *      partials, one repartitioning the reduced frame by key), one
  *      window pass, one generate.
  *   3. LOCF and interpolation fall out of the same generate: a gap
  *      row's carried value IS its generator's observation, and the
  *      interpolation target is the generator's `lead` — no
  *      ignore-nulls window passes at all.
  *   4. Monetary values are quantized to integer cents at the scan
  *      (`round(value*100)` → BIGINT), so every sum/carry is exact
  *      integer arithmetic; floats appear only in the final
  *      interpolation division, rounded to 6 places.
  *
  * The per-bucket observation is the value of the bucket's latest event
  * (`max_by` over the unique, arrival-ordered event id) — one aggregate,
  * no per-event window. Contract: `valueCol` is non-null (the fixture's
  * is) — a NULL-valued latest event would make its bucket's observation
  * NULL and break the generator-carries-the-value identity that lets
  * LOCF skip the ignore-nulls pass.
  */
object TimeSeries {

  /** Resample `events` to `bucketMicros`-wide buckets per `keyCol`,
    * fill interior gaps, and emit per bucket:
    *   - `n_events` / `v_cents`: count and exact integer-cent sum
    *     (0 for gap buckets),
    *   - `obs_cents`: the bucket's observed value (NULL in gaps),
    *   - `locf_cents`: last observation carried forward,
    *   - `v_interp`: linear interpolation across gaps (equals the
    *     observation where one exists; never NULL here because the
    *     series spans observed buckets — the last bucket generates no
    *     gap rows after itself).
    *
    * The series spans each key's own [min, max] observed bucket, so
    * every key's first bucket is observed and LOCF has no leading
    * NULLs.
    */
  def gapfill(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, idCol: String, bucketMicros: Long): DataFrame = {
    // FLOOR division, not Spark's truncate-toward-zero `div`: the two
    // differ for pre-epoch timestamps (negative micros), where truncate
    // would shift events one bucket late and diverge from the oracle's
    // floor `//`. floor(x - ((x % b + b) % b)) / b stays in exact long
    // arithmetic (no double rounding at 1e18 magnitudes).
    val floorIdx = expr(
      s"""(unix_micros($tsCol)
         | - ((unix_micros($tsCol) % ${bucketMicros}L + ${bucketMicros}L)
         |     % ${bucketMicros}L)) div ${bucketMicros}L""".stripMargin)
    val buckets = events
      .select(col(keyCol).as("k"),
        floorIdx.as("idx"),
        expr(s"cast(round($valueCol * 100, 0) as bigint)").as("cents"),
        col(idCol).as("eid"))
      .groupBy(col("k"), col("idx"))
      .agg(count(lit(1)).as("n_obs"), sum(col("cents")).as("sum_cents"),
        max_by(col("cents"), col("eid")).as("obs"))
    val w = Window.partitionBy(col("k")).orderBy(col("idx"))
    val gen = buckets
      .withColumn("next_idx", lead(col("idx"), 1).over(w))
      .withColumn("next_c", lead(col("obs"), 1).over(w))
      .select(col("k"), col("idx").as("gen_idx"), col("n_obs"),
        col("sum_cents"), col("obs"), col("next_idx"), col("next_c"),
        explode(sequence(col("idx"),
          coalesce(col("next_idx") - 1, col("idx")))).as("idx"))
    val isObs = col("idx") === col("gen_idx")
    gen.select(
      col("k").as(keyCol),
      timestamp_micros(col("idx") * lit(bucketMicros)).as("bucket_ts"),
      when(isObs, col("n_obs")).otherwise(lit(0L)).as("n_events"),
      when(isObs, col("sum_cents")).otherwise(lit(0L)).as("v_cents"),
      when(isObs, col("obs")).as("obs_cents"),
      col("obs").as("locf_cents"),
      when(isObs, round(col("obs") / 100.0, 6))
        .when(col("next_c").isNotNull,
          round((col("obs") + (col("next_c") - col("obs")).cast("double") *
            (col("idx") - col("gen_idx")) / (col("next_idx") - col("gen_idx"))
          ) / 100.0, 6))
        .as("v_interp"))
  }

  /** DuckDB twin of [[gapfill]] over the `events` table — deliberately
    * the OTHER formulation (materialized per-key spine + left join +
    * ignore-nulls carry windows), so the oracle agrees on results
    * without sharing the generate-based plan's structure.
    */
  def gapfillOracleSql(bucketMicros: Long): String =
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // $bucketMicros AS idx,
       |    CAST(round(value * 100, 0) AS BIGINT) AS cents, event_id
       |  FROM events),
       |b AS (
       |  SELECT user_id, idx, count(*) AS n_events,
       |    CAST(sum(cents) AS BIGINT) AS v_cents,
       |    max_by(cents, event_id) AS obs_cents
       |  FROM e GROUP BY 1, 2),
       |k AS (SELECT user_id, min(idx) AS mn, max(idx) AS mx FROM b GROUP BY 1),
       |spine AS (SELECT user_id, unnest(range(mn, mx + 1)) AS idx FROM k),
       |j AS (
       |  SELECT s.user_id, s.idx, coalesce(b.n_events, 0) AS n_events,
       |    coalesce(b.v_cents, 0) AS v_cents, b.obs_cents
       |  FROM spine s LEFT JOIN b ON s.user_id = b.user_id AND s.idx = b.idx),
       |w AS (
       |  SELECT user_id, idx, n_events, v_cents, obs_cents,
       |    last_value(obs_cents IGNORE NULLS) OVER lb AS locf_cents,
       |    last_value(CASE WHEN obs_cents IS NULL THEN NULL ELSE idx END IGNORE NULLS)
       |      OVER lb AS prev_b,
       |    first_value(obs_cents IGNORE NULLS) OVER la AS next_c,
       |    first_value(CASE WHEN obs_cents IS NULL THEN NULL ELSE idx END IGNORE NULLS)
       |      OVER la AS next_b
       |  FROM j
       |  WINDOW lb AS (PARTITION BY user_id ORDER BY idx
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |         la AS (PARTITION BY user_id ORDER BY idx
       |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
       |SELECT user_id, make_timestamp(idx * $bucketMicros) AS bucket_ts,
       |  n_events, v_cents, obs_cents, locf_cents,
       |  CASE WHEN obs_cents IS NOT NULL THEN round(obs_cents / 100.0, 6)
       |       WHEN locf_cents IS NOT NULL AND next_c IS NOT NULL THEN
       |         round((locf_cents + (next_c - locf_cents)::DOUBLE *
       |           (idx - prev_b) / (next_b - prev_b)) / 100.0, 6)
       |       ELSE NULL END AS v_interp
       |FROM w""".stripMargin
}
