package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.Tables.t

/** Runtime bloom-filter injection (Spark's InjectRuntimeFilter): when a
  * selective dimension filter feeds a shuffle join, Catalyst builds a
  * bloom filter from the creation side and pushes `might_contain` onto
  * the fact side's scan — at 100 TB this prunes fact rows BEFORE the
  * shuffle, which is the difference between shuffling the full fact
  * table and shuffling the matching slice. In production the default
  * thresholds (creation side <= 10 MB, application scan >= 10 GB) arm
  * it exactly when that trade wins; here the thresholds are lowered to
  * prove the plan shape on fixture-sized data.
  */
class RuntimeFilterSpec extends SparkTestBase {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("selective dim filter injects might_contain on the fact side") {
    val s = spark
    import s.implicits._
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB") {
      val ord = t(s, sf0001, "orders").filter($"o_orderstatus" === "F")
      val li = t(s, sf0001, "lineitem")
      val joined = li.join(ord, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected a runtime bloom filter on the fact side, got:\n$optimized")
      // And the filtered plan still returns the right answer.
      val n = joined.collect().map(r => r.getLong(1)).sum
      val expect = li.join(ord, $"l_orderkey" === $"o_orderkey").count()
      assert(n == expect)
    }
  }

  test("runtime filtering never changes results vs the unfiltered plan") {
    val s = spark
    import s.implicits._
    val plain = withOff {
      t(s, sf0001, "lineitem").join(
        t(s, sf0001, "orders").filter($"o_orderstatus" === "F"),
        $"l_orderkey" === $"o_orderkey").count()
    }
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val n = t(s, sf0001, "lineitem").join(
        t(s, sf0001, "orders").filter($"o_orderstatus" === "F"),
        $"l_orderkey" === $"o_orderkey").count()
      assert(n == plain)
    }
  }

  private def withOff[A](body: => A): A = {
    val k = "spark.sql.optimizer.runtime.bloomFilter.enabled"
    val saved = spark.conf.get(k)
    try { spark.conf.set(k, "false"); body }
    finally spark.conf.set(k, saved)
  }
}
