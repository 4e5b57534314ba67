package graft.queries

import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables.t
import graft.config.{MappingTarget, SchemaConfig, TransformSpec}
import graft.transform.TransformPipeline

/** The config-DSL pipeline as an oracle-checked query: the full
  * read → map → transform → required-filter → metadata → partition
  * derivation chain (transform_data.py:206-212) compiled from a
  * SchemaConfig, with every stage visible in the output schema.
  */
object Pipeline {

  private val ordersSchema = SchemaConfig(
    inputFormat = "parquet",
    mapping = Seq(
      "order_key" -> MappingTarget.Path("o_orderkey"),
      "cust_key" -> MappingTarget.Path("o_custkey"),
      "status" -> MappingTarget.Path("o_orderstatus"),
      "total_price" -> MappingTarget.Path("o_totalprice"),
      "order_date" -> MappingTarget.Path("o_orderdate"),
      "priority" -> MappingTarget.Path("o_orderpriority")),
    required = Seq("order_key", "cust_key"),
    transformations = Seq(
      TransformSpec("total_price", "double"),
      TransformSpec("status", "trim"),
      TransformSpec("order_date", "datetime", format = Some("yyyy-MM-dd HH:mm:ss")),
      TransformSpec("priority", "regexp_replace",
        pattern = Some("^[0-9]-"), replacement = Some("")),
      TransformSpec("ghost_field", "unknown_kind"))) // silently skipped — DSL contract

  /** Deterministic start time so processed_timestamp is oracle-checkable. */
  private val pinnedStart = LocalDateTime.of(2026, 1, 1, 0, 0, 0)

  def cfgPipeline(s: SparkSession, dir: String): DataFrame =
    TransformPipeline.compile(ordersSchema, "orders", pinnedStart,
      partitionBy = Seq("year", "month", "day"))(t(s, dir, "orders"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cfg_pipeline" -> (cfgPipeline _))

  val oracle: Map[String, String] = Map(
    "cfg_pipeline" ->
      """SELECT o_orderkey AS order_key, o_custkey AS cust_key,
        | trim(o_orderstatus) AS status,
        | CAST(o_totalprice AS DOUBLE) AS total_price,
        | CAST(o_orderdate AS DATE) AS order_date,
        | regexp_replace(o_orderpriority, '^[0-9]-', '', 'g') AS priority,
        | 'orders' AS source_name,
        | TIMESTAMP '2026-01-01 00:00:00' AS processed_timestamp,
        | CAST(year(o_orderdate) AS INTEGER) AS year,
        | CAST(month(o_orderdate) AS INTEGER) AS month,
        | CAST(day(o_orderdate) AS INTEGER) AS day
        |FROM orders
        |WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL""".stripMargin)
}
