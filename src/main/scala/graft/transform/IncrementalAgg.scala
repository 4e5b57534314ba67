package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: fold a delta's pre-aggregated
  * rows into an existing published aggregate instead of recomputing
  * from the full history — the refresh pattern that keeps a 100 TB
  * fact table's rollup current by touching only the new partition.
  * The correctness statement (and the oracle's): merged(v1, agg(Δ))
  * must equal agg(base ∪ Δ) exactly — which holds because every
  * measure is a SUM-decomposable exact integer (counts, cents), the
  * same reason the suite's two-level prefix sums and partial
  * aggregates are exact.
  *
  * Scale: the join touches |distinct keys|, not |facts| — both sides
  * are already aggregates; the delta side is typically broadcast-
  * sized after its own map-side combine.
  */
object IncrementalAgg {

  /** Full-outer merge on `keys`, each measure summed with NULL→0 (a
    * key absent from one side contributes nothing there). Measures
    * must be sum-decomposable (counts, integer sums) — averages or
    * distincts do not merge this way and must be carried as
    * decomposed numerators/denominators or sketches.
    */
  def merge(current: DataFrame, delta: DataFrame, keys: Seq[String],
      measures: Seq[String]): DataFrame = {
    val c = current.select(
      (keys.map(col) ++ measures.map(m => col(m).as(s"__c_$m"))): _*)
    val d = delta.select(
      (keys.map(col) ++ measures.map(m => col(m).as(s"__d_$m"))): _*)
    c.join(d, keys, "full_outer")
      .select((keys.map(col) ++ measures.map(m =>
        (coalesce(col(s"__c_$m"), lit(0L)) +
          coalesce(col(s"__d_$m"), lit(0L))).as(m))): _*)
  }
}
