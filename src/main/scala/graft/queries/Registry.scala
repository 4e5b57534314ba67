package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Single assembly point for the driver contract: every implemented
  * operator from SURVEY.md §2 surfaces here as a named query, and every
  * SQL-expressible one carries a DuckDB oracle. Names are shared between
  * `queries` and `oracle`; result column names/aliases must match the
  * oracle SQL exactly (driver hashes sort columns by name).
  */
object Registry {
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Scalar.queries ++ NorthStar.queries ++ Pipeline.queries

  val oracle: Map[String, String] =
    Relational.oracle ++ Scalar.oracle ++ NorthStar.oracle ++ Pipeline.oracle

  require(oracle.keySet.subsetOf(queries.keySet),
    s"oracle entries without a query: ${oracle.keySet -- queries.keySet}")
}
