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

  /** Registered rows that re-run a composition an identically-oracled
    * Scala twin already times: each `cfg_*` row compiles a YAML config
    * to the SAME plan its twin builds in Scala (their oracle SQL is
    * literally shared — see Pipeline.oracle). The rows stay registered
    * (they gate config↔Scala equality), but bench artifacts stamp them
    * `twin_of` so a cross-round comparison can separate OPERATOR drift
    * (the twin moved too) from CONFIG-COMPILER drift (only the cfg row
    * moved). `cfg_pipeline` is absent deliberately: it exercises the
    * orchestrated end-to-end report, which no single Scala row times.
    */
  val twinOf: Map[String, String] = Map(
    "cfg_curation" -> "training_manifest",
    "cfg_semantic_dedup" -> "semantic_dedup",
    "cfg_sim_topk" -> "sim_topk_filtered_ivf",
    "cfg_ann_recall" -> "ann_recall",
    "cfg_ivf_retrain" -> "ivf_retrain_stats",
    "cfg_decontam" -> "decontam",
    "cfg_dsir" -> "dsir_sample",
    "cfg_substr_dedup" -> "substr_dedup",
    "cfg_lm_buckets" -> "ccnet_buckets",
    "cfg_gopher" -> "gopher_rules",
    "cfg_gopher_lines" -> "gopher_rules_lines",
    "cfg_c4" -> "c4_rules",
    "cfg_gopher_repetition" -> "gopher_repetition",
    "cfg_charset" -> "script_profile",
    "cfg_html_strip" -> "html_strip")

  require(twinOf.keySet.subsetOf(queries.keySet) &&
    twinOf.values.toSet.subsetOf(queries.keySet),
    "twinOf names a query that is not registered")
}
