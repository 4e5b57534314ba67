package graft.quality

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.config.{MetricSpec, QualityCheck}

/** Data-quality checks (SURVEY F2-F4; sample_source.yaml:85-95) and
  * threshold monitors (F6; sample_source.yaml:98-107).
  *
  * Scale design: all not_null and regex checks for a run are evaluated
  * in ONE aggregate pass over the data (a single job, map-side partial
  * aggregation); each unique check is its own groupBy (it genuinely
  * needs a shuffle on its key set). No collect of row data — only the
  * per-check violation counts come back to the driver.
  *
  * Null contract: a NULL value violates `not_null`, never `regex` —
  * regex evaluates only present values (SQL `rlike` three-valued
  * semantics). Configure both checks on a column to get both gates.
  */
object QualityChecks {

  final case class CheckResult(check: QualityCheck, violations: Long) {
    def passed: Boolean = violations == 0
  }

  final case class QualityReport(rowCount: Long, results: Seq[CheckResult]) {
    def passed: Boolean = results.forall(_.passed)
  }

  def run(df: DataFrame, checks: Seq[QualityCheck]): QualityReport = {
    val scalarChecks = checks.filter(c => c.kind == "not_null" || c.kind == "regex")
    val uniqueChecks = checks.filter(_.kind == "unique")

    // One pass: row count + every scalar check as a conditional count.
    val aggs = count(lit(1)).as("__rows") +: scalarChecks.zipWithIndex.map {
      case (c, i) =>
        val viol = c.kind match {
          case "not_null" =>
            c.columns.map(col(_).isNull).reduce(_ || _)
          case "regex" =>
            val target = c.columns.head
            col(target).isNotNull && !col(target).rlike(c.pattern.getOrElse(".*"))
        }
        count(when(viol, 1)).as(s"__c$i")
    }
    val row: Row = df.agg(aggs.head, aggs.tail: _*).head()
    val rowCount = row.getLong(0)
    val scalarResults = scalarChecks.zipWithIndex.map { case (c, i) =>
      CheckResult(c, row.getLong(i + 1))
    }

    val uniqueResults = uniqueChecks.map { c =>
      val dupKeys = df.groupBy(c.columns.map(col): _*)
        .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).count()
      CheckResult(c, dupKeys)
    }

    QualityReport(rowCount, scalarResults ++ uniqueResults)
  }

  /** Rows violating any check — the quarantine split (violations go to a
    * side path instead of silently dropping). unique violations are the
    * 2nd..nth copies per duplicated key.
    */
  def quarantine(df: DataFrame, checks: Seq[QualityCheck]): DataFrame = {
    val scalarViol = checks.collect {
      case c if c.kind == "not_null" => c.columns.map(col(_).isNull).reduce(_ || _)
      case c if c.kind == "regex" =>
        val t = c.columns.head
        col(t).isNotNull && !col(t).rlike(c.pattern.getOrElse(".*"))
    }
    val base = if (scalarViol.nonEmpty) df.filter(scalarViol.reduce(_ || _))
               else df.limit(0)
    checks.filter(_.kind == "unique").foldLeft(base) { (acc, c) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(c.columns.map(col): _*)
        .orderBy(df.columns.map(col): _*)
      acc.unionByName(
        df.withColumn("__rn", row_number().over(w)).filter(col("__rn") > 1).drop("__rn"))
    }
  }

  /** Referential-integrity check: child rows whose foreign key has no
    * parent — the orphan detection a pipeline runs between a fact load
    * and its dimension. One left-anti join keyed on the FK: the parent
    * side ships only its distinct key column (broadcast when the
    * dimension is small, keyed shuffle otherwise — never parent
    * payloads), and only the violation count returns to the driver.
    * NULL foreign keys are not orphans (that's `not_null`'s contract).
    */
  def referentialViolations(child: DataFrame, fkCol: String,
      parent: DataFrame, pkCol: String): DataFrame = {
    child
      .filter(col(fkCol).isNotNull)
      .join(parent.select(col(pkCol).as(fkCol)).distinct(), Seq(fkCol), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
      .crossJoin(child.agg(count(lit(1)).as("n_rows")))
  }

  /** F15: k-anonymity audit — the privacy gate a pipeline runs before
    * publishing a table as training data: every row must share its
    * quasi-identifier combination with at least k−1 others, else the
    * combination re-identifies. Reports the violating-group count,
    * the rows they expose, and the group-size extremes (min < k is
    * the one-glance verdict).
    *
    * Scale shape: one partial-aggregated exchange keyed on the QI
    * tuple (group count ≪ rows), then a scalar fold over the group
    * frame — the same two-level shape as every counting audit here;
    * QI payloads never shuffle, only the tuple + count.
    */
  def kAnonymity(df: DataFrame, qiCols: Seq[Column], k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    df.groupBy(qiCols: _*)
      .agg(count(lit(1)).as("grp_n"))
      .agg(
        count(when(col("grp_n") < k, 1)).as("violating_groups"),
        coalesce(sum(when(col("grp_n") < k, col("grp_n"))), lit(0))
          .cast("long").as("violating_rows"),
        count(lit(1)).as("n_groups"),
        min(col("grp_n")).as("min_group"),
        max(col("grp_n")).as("max_group"))
  }

  /** F6: threshold monitors — compare a named metric against its
    * configured threshold (sample_source.yaml:98-107).
    */
  def evaluateMonitors(metrics: Map[String, Double], specs: Seq[MetricSpec]): Seq[(MetricSpec, Boolean)] =
    specs.map { m =>
      val v = metrics.getOrElse(m.name, 0.0)
      val breached = m.comparison match {
        case "GreaterThan"          => v > m.threshold
        case "GreaterThanOrEqualTo" => v >= m.threshold
        case "LessThan"             => v < m.threshold
        case "LessThanOrEqualTo"    => v <= m.threshold
        case _                      => false
      }
      (m, breached)
    }
}
