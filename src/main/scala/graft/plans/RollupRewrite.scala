package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Divide, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** One registered rollup: a landed pre-aggregate of `basePath` grouped
  * by `groupCols`, carrying `countCol` = count(*) and, for each base
  * measure column in `sumCols`/`minCols`/`maxCols`, its
  * sum/min/max under the mapped rollup column name. sum+count also
  * serve `avg(col)` (rewritten as sum/count — avg is not itself
  * mergeable, its pieces are). The rollup must be maintained
  * consistent with the base (built from it, refreshed via
  * [[graft.transform.IncrementalAgg]]) — the rewrite assumes, not
  * checks, freshness, exactly like every MV router.
  */
final case class RollupTarget(
    basePath: String,
    rollupPath: String,
    groupCols: Seq[String],
    countCol: String,
    sumCols: Map[String, String],
    minCols: Map[String, String] = Map.empty,
    maxCols: Map[String, String] = Map.empty)

/** Materialized-rollup query routing — the Calcite-style MV rewrite as
  * a Catalyst `Rule[LogicalPlan]`: an `Aggregate` whose child is the
  * registered base scan, whose grouping is exactly the rollup's
  * grouping, and whose aggregates are only `count(*)` / `sum(col)` over
  * covered measures, is rewritten into a scan of the landed rollup —
  * output names AND exprIds preserved, so the parent plan is untouched.
  *
  * Why this matters at 100 TB: the rollup is |distinct keys| rows; the
  * base is the fact table. A matching dashboard/report aggregate goes
  * from a full-table scan + exchange to a KB-scale file read, without
  * the query author knowing the rollup exists. Sums must be
  * order-independent-exact for the rewrite to be semantically invisible
  * — integer-valued measures, the suite-wide discipline.
  *
  * Conservative by construction: the base-scan match accepts only a
  * bare parquet relation (or a column-pruning Project over one) rooted
  * at the registered path — any Filter/Join/extra measure defeats the
  * match and the plan runs unrewritten. Installed per-session via
  * `spark.experimental.extraOptimizations` (the user-provided optimizer
  * batch), the live-session analog of a SparkSessionExtensions
  * `injectOptimizerRule`.
  */
case class RollupRewrite(spark: SparkSession, target: RollupTarget)
    extends Rule[LogicalPlan] {

  private def pathOf(s: String): String =
    new org.apache.hadoop.fs.Path(s).toUri.getPath

  private def isBaseScan(plan: LogicalPlan): Boolean = plan match {
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      fs.location.rootPaths.exists(p => pathOf(p.toString) == pathOf(target.basePath))
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      isBaseScan(child)
    case _ => false
  }

  /** Every output slot must be a grouping attribute, count(*), or a
    * covered sum — anything else defeats the rewrite.
    */
  private def coveredOutput(groups: Seq[AttributeReference],
      e: NamedExpression): Boolean = e match {
    case a: AttributeReference => groups.exists(_.exprId == a.exprId)
    case Alias(ae: AggregateExpression, _)
        if !ae.isDistinct && ae.filter.isEmpty =>
      ae.aggregateFunction match {
        case Count(Seq(Literal(1, _))) => true
        case Sum(a: AttributeReference, _) => target.sumCols.contains(a.name)
        case Min(a: AttributeReference) => target.minCols.contains(a.name)
        case Max(a: AttributeReference) => target.maxCols.contains(a.name)
        // avg = covered sum / count(*): exact whenever the suite-wide
        // order-independent-sum discipline holds (integer-valued
        // measures — the division is then one deterministic double op).
        // Decimal measures are excluded: Spark's native avg over
        // DecimalType returns a decimal with widened precision, while
        // this route returns DoubleType — the result schema would then
        // depend on whether the rule fired.
        case Average(a: AttributeReference, _) =>
          target.sumCols.contains(a.name) &&
            !a.dataType.isInstanceOf[DecimalType]
        case _ => false
      }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(groups, aggExprs, child, _)
        if isBaseScan(child) &&
          groups.forall(_.isInstanceOf[AttributeReference]) &&
          groups.map(_.asInstanceOf[AttributeReference].name).sorted ==
            target.groupCols.sorted &&
          aggExprs.forall(e => coveredOutput(
            groups.map(_.asInstanceOf[AttributeReference]), e)) =>
      rewrite(agg)
  }

  private def rewrite(agg: Aggregate): LogicalPlan = {
    val rollup = spark.read.parquet(target.rollupPath).queryExecution.analyzed
    def rattr(name: String): AttributeReference =
      rollup.output.collectFirst {
        case a: AttributeReference if a.name == name => a
      }.getOrElse(throw new IllegalStateException(
        s"rollup ${target.rollupPath} is missing column $name"))
    val projList: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference =>
        Alias(rattr(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(ae: AggregateExpression, name) =>
        ae.aggregateFunction match {
          case _: Count =>
            Alias(rattr(target.countCol), name)(exprId = al.exprId)
          case Sum(a: AttributeReference, _) =>
            Alias(rattr(target.sumCols(a.name)), name)(exprId = al.exprId)
          case Min(a: AttributeReference) =>
            Alias(rattr(target.minCols(a.name)), name)(exprId = al.exprId)
          case Max(a: AttributeReference) =>
            Alias(rattr(target.maxCols(a.name)), name)(exprId = al.exprId)
          case Average(a: AttributeReference, _) =>
            Alias(Divide(
              Cast(rattr(target.sumCols(a.name)), DoubleType),
              Cast(rattr(target.countCol), DoubleType)), name)(exprId = al.exprId)
          case other => throw new IllegalStateException(
            s"unreachable: unmatched aggregate $other")
        }
      case other => throw new IllegalStateException(
        s"unreachable: unmatched output $other")
    }
    Project(projList, rollup)
  }
}

object RollupRewrite {

  /** Idempotently install the rewrite for `target` on the session's
    * user-provided optimizer batch.
    */
  def install(spark: SparkSession, target: RollupTarget): Unit =
    spark.experimental.synchronized {
      val cur = spark.experimental.extraOptimizations
      val already = cur.exists {
        case RollupRewrite(_, t) => t == target
        case _ => false
      }
      if (!already)
        spark.experimental.extraOptimizations = cur :+ RollupRewrite(spark, target)
    }
}
