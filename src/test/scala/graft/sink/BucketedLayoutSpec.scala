package graft.sink

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Proves the bucketed layout's scale claim: a join (and an aggregate)
  * on the bucket key off two same-bucketed tables plans with ZERO
  * shuffle exchanges — the scan's HashPartitioning satisfies the
  * operator's distribution requirement directly.
  */
class BucketedLayoutSpec extends SparkTestBase {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("same-bucket join and bucket-key aggregate plan with zero shuffles") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("graft-bkt").toString
    val left = (1L to 1000L).map(k => (k, s"l$k")).toDF("k", "lv")
    val right = (1L to 1000L).filter(_ % 3 == 0).map(k => (k, k * 2.0)).toDF("k", "rv")
    BucketedLayout.writeBucketed(left, "bkt_left", s"$base/left", 4, "k")
    BucketedLayout.writeBucketed(
      right.withColumnRenamed("k", "rk"), "bkt_right", s"$base/right", 4, "rk")

    // Static plans (AQE off) so EnsureRequirements' decisions are
    // directly inspectable; broadcast off so the join would otherwise
    // HAVE to shuffle both sides.
    withConf(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {

      val joined = s.table("bkt_left")
        .join(s.table("bkt_right"), $"k" === $"rk")
      val jplan = joined.queryExecution.executedPlan
      assert(jplan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"expected shuffle-free bucketed join, got:\n$jplan")
      assert(jplan.collect { case j: SortMergeJoinExec => j }.nonEmpty)

      val agg = s.table("bkt_left").groupBy($"k").agg(count(lit(1)).as("n"))
      assert(agg.queryExecution.executedPlan
        .collect { case e: ShuffleExchangeExec => e }.isEmpty,
        "bucket-key aggregate should reuse the storage partitioning")

      // And the shuffle-free plan is still CORRECT: equality with the
      // plain (non-bucketed) join on the same data.
      val expected = left.join(right.withColumnRenamed("k", "rk"), $"k" === $"rk")
        .collect().map(_.toSeq).toSet
      assert(joined.collect().map(_.toSeq).toSet == expected)
    }
  }

  test("mismatched bucket counts fall back to a correct shuffled join") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("graft-bkt2").toString
    val df = (1L to 100L).map(k => (k, k * 1.0)).toDF("k", "v")
    BucketedLayout.writeBucketed(df, "bkt_a4", s"$base/a4", 4, "k")
    BucketedLayout.writeBucketed(
      df.withColumnRenamed("k", "rk"), "bkt_a8", s"$base/a8", 8, "rk")
    withConf(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = s.table("bkt_a4").join(s.table("bkt_a8"), $"k" === $"rk")
      assert(joined.count() == 100L) // correctness regardless of layout
    }
  }
}
