package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Single assembly point for the driver contract: every implemented
  * operator from SURVEY.md §2 surfaces here as a named query, and every
  * SQL-expressible one carries a DuckDB oracle. Names are shared between
  * `queries` and `oracle`; result column names/aliases must match the
  * oracle SQL exactly (driver hashes sort columns by name).
  */
object Registry {
  private val sources = Seq(
    Relational.queries, Scalar.queries, NorthStar.queries, Pipeline.queries,
    ScaleOps.queries, Temporal.queries, Analytics.queries, Broker.queries,
    Tokenizer.queries, Tpch.queries)

  // ++ would silently keep the last duplicate — fail loudly instead.
  require(sources.map(_.keySet.size).sum == sources.flatMap(_.keySet).distinct.size, {
    val dups = sources.flatMap(_.keySet).groupBy(identity).collect {
      case (k, vs) if vs.size > 1 => k
    }
    s"duplicate query names across battery files: ${dups.mkString(", ")}"
  })

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    sources.reduce(_ ++ _)

  val oracle: Map[String, String] =
    Relational.oracle ++ Scalar.oracle ++ NorthStar.oracle ++ Pipeline.oracle ++
      ScaleOps.oracle ++ Temporal.oracle ++ Analytics.oracle ++ Broker.oracle ++
      Tokenizer.oracle ++ Tpch.oracle

  require(oracle.keySet.subsetOf(queries.keySet),
    s"oracle entries without a query: ${oracle.keySet -- queries.keySet}")
}
