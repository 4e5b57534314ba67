package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed CDC merge (upsert/delete application) — the incremental-load
  * step between the reference's append-only landing and its
  * staging-swap publish (`redshift_loader/handler.py` reloads whole
  * tables; a change-feed merge is what replaces that at scales where a
  * full reload is not an option).
  *
  * Semantics: the NEWEST change per key wins (ordered by a sequence
  * column — CDC log offset, commit LSN, ingest timestamp); op 'D'
  * deletes the key, any other op replaces/inserts the payload;
  * untouched base rows pass through unchanged.
  *
  * Scale shape — the base side NEVER shuffles: untouched rows come from
  * a broadcast anti-join against the (small, by CDC nature) touched-key
  * set, and the surviving change payloads are unioned on top. A
  * full-outer-join formulation would force both sides through a keyed
  * exchange — shuffling 100 TB of base to apply a few GB of changes.
  * Only the change feed shuffles (for its per-key latest-wins window;
  * Catalyst plans that window once per consumer branch — two exchanges
  * of the SMALL side, which profiling keeps over pinning the feed in
  * executor memory with a checkpoint). If the feed ever outgrows
  * broadcast, AQE degrades the hint to a shuffled anti-join; semantics
  * are unchanged.
  */
object CdcMerge {

  /** Latest change per key: row_number over (key, seq DESC). Sequence
    * values must be unique per key (true of log offsets); ties would
    * be broken arbitrarily.
    */
  def latestChanges(changes: DataFrame, key: String, seqCol: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(seqCol).desc)
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Apply a change feed to a base snapshot. `changes` carries the base
    * payload columns plus `opCol` ('D' = delete, anything else =
    * upsert) and `seqCol`; the result has exactly the base schema.
    *
    * `broadcastFeed = false` is the escape hatch for a pathological
    * feed that outgrows driver/executor broadcast memory (a backfill
    * replaying months of changes): the anti-join falls back to
    * Catalyst's own strategy choice — a shuffled join of base on the
    * key, never a driver OOM. Semantics are identical either way
    * (`CdcMergeSpec` asserts result identity with the hint disabled).
    */
  def applyChanges(base: DataFrame, changes: DataFrame, key: String,
      opCol: String = "op", seqCol: String = "seq",
      broadcastFeed: Boolean = true): DataFrame = {
    val payload = base.columns.toSeq
    val latest = latestChanges(changes, key, seqCol)
    val touched = latest.select(key)
    val untouched = base.join(
      if (broadcastFeed) broadcast(touched) else touched, Seq(key), "left_anti")
    val upserts = latest.filter(col(opCol) =!= "D").select(payload.map(col): _*)
    untouched.select(payload.map(col): _*).unionByName(upserts)
  }
}
