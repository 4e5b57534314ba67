package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.Tables.t

/** Incremental near-dup against a landed index: result equality with
  * the exact cross-split truth, and the scale claim — the landed base
  * tables enter both joins WITHOUT a shuffle on their side.
  */
class IncrementalDedupSpec extends SparkTestBase {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def landIndex(): (String, String) = {
    val s = spark
    val base = Files.createTempDirectory("graft-ndx").toString
    val docs = t(s, sf0001, "documents")
    val (numHashes, numBands) = NearDup.bandingFor(0.5)
    val baseSh = NearDup.shingleSets(
      docs.filter(col("doc_id") % 10 =!= 7), "doc_id", "text", 3)
    graft.sink.BucketedLayout.writeBucketed(
      NearDup.bandIndex(baseSh, numHashes, numBands),
      "ndx_keys_spec", s"$base/keys", 8, "bkey")
    graft.sink.BucketedLayout.writeBucketed(
      baseSh, "ndx_sh_spec", s"$base/sh", 8, "doc_id")
    ("ndx_keys_spec", "ndx_sh_spec")
  }

  test("incremental pairs equal the exact cross-split Jaccard truth") {
    val s = spark; import s.implicits._
    val (kt, st) = landIndex()
    val docs = t(s, sf0001, "documents")
    val inc = docs.filter($"doc_id" % 10 === 7)

    val got = NearDup.incrementalPairs(inc, "doc_id", "text", 0.5,
        s.table(kt), s.table(st))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val toks = split(trim($"text"), "\\s+")
    val sh = docs.filter(size(toks) >= 3)
      .select($"doc_id", NearDup.hashedShingles($"text", 3).as("sh"))
    val jac = size(array_intersect($"sh_n", $"sh_b")).cast("double") /
      size(array_union($"sh_n", $"sh_b")).cast("double")
    val want = sh.filter($"doc_id" % 10 === 7)
      .select($"doc_id".as("new_id"), $"sh".as("sh_n"))
      .crossJoin(sh.filter($"doc_id" % 10 =!= 7)
        .select($"doc_id".as("base_id"), $"sh".as("sh_b")))
      .filter(jac >= 0.5)
      .select($"new_id", $"base_id", round(jac, 6).as("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(got == want)
    assert(want.nonEmpty, "fixture should have cross-split near-dup pairs")
  }

  test("base index scans feed both joins without a base-side shuffle") {
    val s = spark
    val (kt, st) = landIndex()
    val docs = t(s, sf0001, "documents")
    val inc = docs.filter(col("doc_id") % 10 === 7)
    withConf(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = NearDup.incrementalPairs(inc, "doc_id", "text", 0.5,
        s.table(kt), s.table(st)).queryExecution.executedPlan
      // No ShuffleExchange may sit between a bucketed base scan and
      // its join: the bucket layout satisfies the join's distribution
      // straight off the scan. Exchanges ABOVE a join are fine — they
      // move the join's (increment-sized) output, not the base.
      def scanBeforeJoin(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
        p match {
          case f: FileSourceScanExec => f.bucketedScan
          case _: org.apache.spark.sql.execution.joins.BaseJoinExec => false
          case other => other.children.exists(scanBeforeJoin)
        }
      val offending = plan.collect {
        case e: ShuffleExchangeExec if scanBeforeJoin(e.child) => e
      }
      assert(offending.isEmpty,
        s"base bucketed scan shuffled before its join:\n$plan")
      // And the landed tables ARE read as bucketed scans.
      val bucketedScans = plan.collect {
        case f: FileSourceScanExec if f.bucketedScan => f
      }
      assert(bucketedScans.size == 2, s"expected 2 bucketed scans:\n$plan")
    }
  }
}
