package graft.plans

import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The MV-routing contract: a covered aggregate's optimized plan reads
  * the ROLLUP (plan-asserted, not inferred from results), the results
  * are bit-identical to the unrewritten computation, and any
  * non-covered shape (extra measure, filter, distinct) leaves the base
  * scan in place.
  */
class RollupRewriteSpec extends SparkTestBase {
  import spark.implicits._

  private def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case LogicalRelation(fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.map(_.toUri.getPath)
    }.flatten

  private def landed(): (String, String, RollupTarget) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv").toString
    val base = s"$dir/base.parquet"
    val rollup = s"$dir/rollup.parquet"
    (0 until 1000).map(i => (s"g${i % 3}", s"h${i % 2}", (i % 7).toDouble, i.toLong))
      .toDF("g", "h", "m", "extra")
      .write.parquet(base)
    spark.read.parquet(base).groupBy($"g", $"h")
      .agg(count(lit(1)).as("n_rows"), sum($"m").as("sum_m"))
      .write.parquet(rollup)
    (base, rollup,
      RollupTarget(base, rollup, Seq("g", "h"), "n_rows", Map("m" -> "sum_m")))
  }

  test("covered aggregate is routed to the rollup and stays exact") {
    val (base, rollup, target) = landed()
    // Expected BEFORE installing the rule, from the same plan shape.
    val q = () => spark.read.parquet(base).groupBy($"g", $"h")
      .agg(count(lit(1)).as("n"), sum($"m").as("s"))
    val expect = q().collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    RollupRewrite.install(spark, target)
    val routed = q()
    val paths = scanPaths(routed)
    assert(paths.exists(_.endsWith("rollup.parquet")),
      s"rewrite did not fire; scans: $paths")
    assert(!paths.exists(_.endsWith("base.parquet")))
    val got = routed.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === expect)
  }

  test("non-covered shapes keep the base scan") {
    val (base, _, target) = landed()
    RollupRewrite.install(spark, target)
    val extraMeasure = spark.read.parquet(base).groupBy($"g", $"h")
      .agg(sum($"m").as("s"), sum($"extra").as("x"))
    assert(scanPaths(extraMeasure).exists(_.endsWith("base.parquet")))
    val filtered = spark.read.parquet(base).filter($"extra" > 10)
      .groupBy($"g", $"h").agg(sum($"m").as("s"))
    assert(scanPaths(filtered).exists(_.endsWith("base.parquet")))
    val distinctAgg = spark.read.parquet(base).groupBy($"g", $"h")
      .agg(countDistinct($"m").as("d"))
    assert(scanPaths(distinctAgg).exists(_.endsWith("base.parquet")))
    val wrongGroups = spark.read.parquet(base).groupBy($"g")
      .agg(sum($"m").as("s"))
    assert(scanPaths(wrongGroups).exists(_.endsWith("base.parquet")))
  }

  private def landedMm(): (String, String, RollupTarget) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-mm").toString
    val base = s"$dir/base.parquet"
    val rollup = s"$dir/rollup.parquet"
    (0 until 1000).map(i => (s"g${i % 3}", s"h${i % 2}", (i % 7).toDouble, i.toLong))
      .toDF("g", "h", "m", "extra")
      .write.parquet(base)
    spark.read.parquet(base).groupBy($"g", $"h")
      .agg(count(lit(1)).as("n_rows"), sum($"m").as("sum_m"),
        min($"m").as("min_m"), max($"m").as("max_m"))
      .write.parquet(rollup)
    (base, rollup,
      RollupTarget(base, rollup, Seq("g", "h"), "n_rows", Map("m" -> "sum_m"),
        minCols = Map("m" -> "min_m"), maxCols = Map("m" -> "max_m")))
  }

  test("min/max/avg route to the rollup and stay exact") {
    val (base, _, target) = landedMm()
    val q = () => spark.read.parquet(base).groupBy($"g", $"h")
      .agg(min($"m").as("mn"), max($"m").as("mx"),
        avg($"m").as("av"), count(lit(1)).as("n"))
    val expect = q().collect().map(r => (r.getString(0), r.getString(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5))).toSet
    RollupRewrite.install(spark, target)
    val routed = q()
    val paths = scanPaths(routed)
    assert(paths.exists(_.endsWith("rollup.parquet")),
      s"rewrite did not fire; scans: $paths")
    assert(!paths.exists(_.endsWith("base.parquet")))
    val got = routed.collect().map(r => (r.getString(0), r.getString(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5))).toSet
    assert(got === expect)
  }

  test("per-aggregate non-covered lanes: unregistered column defeats each new rewrite") {
    val (base, _, target) = landedMm()
    RollupRewrite.install(spark, target)
    // min over a column with no minCols mapping.
    val minNc = spark.read.parquet(base).groupBy($"g", $"h")
      .agg(min($"extra").as("mn"))
    assert(scanPaths(minNc).exists(_.endsWith("base.parquet")))
    // max over a column with no maxCols mapping.
    val maxNc = spark.read.parquet(base).groupBy($"g", $"h")
      .agg(max($"extra").as("mx"))
    assert(scanPaths(maxNc).exists(_.endsWith("base.parquet")))
    // avg over a column with no sum coverage.
    val avgNc = spark.read.parquet(base).groupBy($"g", $"h")
      .agg(avg($"extra").as("av"))
    assert(scanPaths(avgNc).exists(_.endsWith("base.parquet")))
    // A SUM-only target (no minCols/maxCols) must not route min/max/avg
    // it can't serve — min on the sum-covered measure still defeats it.
    val (base2, _, sumOnly) = landed()
    RollupRewrite.install(spark, sumOnly)
    val minOnSumOnly = spark.read.parquet(base2).groupBy($"g", $"h")
      .agg(min($"m").as("mn"))
    assert(scanPaths(minOnSumOnly).exists(_.endsWith("base.parquet")))
    // ...while avg IS routable there (sum+count cover it).
    val avgOnSumOnly = spark.read.parquet(base2).groupBy($"g", $"h")
      .agg(avg($"m").as("av"))
    assert(scanPaths(avgOnSumOnly).exists(_.endsWith("rollup.parquet")))
  }

  test("avg over a DECIMAL measure does not route (schema would flip to double)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-dec").toString
    val base = s"$dir/base.parquet"
    val rollup = s"$dir/rollup.parquet"
    (0 until 100).map(i => (s"g${i % 3}", BigDecimal(i).setScale(2)))
      .toDF("g", "m").write.parquet(base)
    spark.read.parquet(base).groupBy($"g")
      .agg(count(lit(1)).as("n_rows"), sum($"m").as("sum_m"))
      .write.parquet(rollup)
    RollupRewrite.install(spark,
      RollupTarget(base, rollup, Seq("g"), "n_rows", Map("m" -> "sum_m")))
    val q = spark.read.parquet(base).groupBy($"g").agg(avg($"m").as("av"))
    // Must keep the base scan: native avg(decimal) returns DecimalType,
    // the routed Divide(cast double) would return DoubleType.
    assert(scanPaths(q).exists(_.endsWith("base.parquet")))
    assert(q.schema("av").dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType])
    // sum over the same decimal measure still routes (types agree).
    val qs = spark.read.parquet(base).groupBy($"g").agg(sum($"m").as("s"))
    assert(scanPaths(qs).exists(_.endsWith("rollup.parquet")))
  }

  test("incrementally-maintained rollup keeps routed answers fresh") {
    // The maintenance loop the rule assumes: base grows by a delta,
    // the rollup folds the delta via IncrementalAgg (never recomputing
    // from history), and the ROUTED query — which still targets the
    // base path — returns the merged truth. This is the batch twin of
    // the St13 streaming foreachBatch fold.
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-ivm").toString
    val base = s"$dir/base.parquet"
    val rollup = s"$dir/rollup.parquet"
    def aggOf(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"g", $"h").agg(count(lit(1)).as("n_rows"), sum($"m").as("sum_m"))
    val batch1 = (0 until 300).map(i => (s"g${i % 3}", s"h${i % 2}", (i % 7).toDouble))
      .toDF("g", "h", "m")
    batch1.write.parquet(base)
    aggOf(spark.read.parquet(base)).write.parquet(rollup)
    RollupRewrite.install(spark,
      RollupTarget(base, rollup, Seq("g", "h"), "n_rows", Map("m" -> "sum_m")))
    // Delta lands in the base AND folds into the rollup — IVM, not recompute.
    val batch2 = (300 until 500).map(i => (s"g${i % 3}", s"h${i % 2}", (i % 7).toDouble))
      .toDF("g", "h", "m")
    batch2.write.mode("append").parquet(base)
    val merged = graft.transform.IncrementalAgg.merge(
      spark.read.parquet(rollup), aggOf(batch2),
      Seq("g", "h"), Seq("n_rows", "sum_m"))
    val staged = s"$dir/rollup2.parquet"
    merged.write.parquet(staged)
    spark.read.parquet(staged).write.mode("overwrite").parquet(rollup)
    val routed = spark.read.parquet(base).groupBy($"g", $"h")
      .agg(count(lit(1)).as("n"), sum($"m").as("s"))
    assert(scanPaths(routed).exists(_.endsWith("rollup.parquet")))
    val expect = (0 until 500)
      .map(i => ((s"g${i % 3}", s"h${i % 2}"), (i % 7).toDouble))
      .groupBy(_._1).map { case (k, vs) => (k._1, k._2, vs.size.toLong, vs.map(_._2).sum) }
      .toSet
    val got = routed.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === expect)
  }

  test("install is idempotent per target") {
    val (_, _, target) = landed()
    RollupRewrite.install(spark, target)
    RollupRewrite.install(spark, target)
    val n = spark.experimental.extraOptimizations.count {
      case RollupRewrite(_, t) => t == target
      case _ => false
    }
    assert(n === 1)
  }
}
