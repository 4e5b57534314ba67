package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Bloom-pruned exact dedup: result-identical to the plain digest
  * groupBy with provably-unique keys kept out of the exchange.
  */
class BloomDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("no false negatives: every truly duplicated key is a candidate") {
    // 500 unique keys + 50 keys duplicated across partitions (each
    // copy lands in a different partition, so within-partition state
    // alone can never see the repeat — the merge intersection must).
    val uniq = (1L to 500L).map(k => k * 1000L)
    val dups = (1L to 50L)
    val keys = spark.createDataset(uniq ++ dups ++ dups).repartition(8)
    val bloom = BloomDedup.dupCandidateBloom(keys.as[Long], 600L, 0.01)
    dups.foreach { k =>
      assert(bloom.mightContainLong(k), s"duplicated key $k missed")
    }
  }

  test("pruning is real: an all-unique corpus flags at most ~fpp keys") {
    val keys = spark.createDataset((1L to 2000L).map(_ * 7919L)).repartition(8)
    val bloom = BloomDedup.dupCandidateBloom(keys.as[Long], 2000L, 0.01)
    val flagged = (1L to 2000L).count(k => bloom.mightContainLong(k * 7919L))
    // fpp 1% over 2000 keys: expect ~20; 5% is a generous ceiling.
    assert(flagged <= 100, s"$flagged of 2000 unique keys flagged")
  }

  test("output is row-identical to dedup_exact on the fixture") {
    val a = graft.queries.NorthStar.dedupExact(spark, sf0001)
      .orderBy("text_hash", "keep_id").collect().toSeq
    val b = graft.queries.NorthStar.dedupExactBloom(spark, sf0001)
      .orderBy("text_hash", "keep_id").collect().toSeq
    assert(a === b)
  }

  test("cross-partition duplicates get the right survivor and count") {
    val docs = Seq(
      (1L, "alpha"), (2L, "beta"), (3L, "alpha"), (4L, "gamma"),
      (5L, "alpha"), (6L, "beta"), (7L, "delta"))
      .toDF("doc_id", "text").repartition(7)
    val out = BloomDedup.dedup(docs, "doc_id", "text")
      .collect().map(r => r.getString(2) -> (r.getLong(0), r.getLong(1))).toMap
    val byText = Map(
      "alpha" -> (1L, 3L), "beta" -> (2L, 2L),
      "gamma" -> (4L, 1L), "delta" -> (7L, 1L))
    val md5of = Seq("alpha", "beta", "gamma", "delta")
      .map(t => t -> java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString).toMap
    byText.foreach { case (text, expect) =>
      assert(out(md5of(text)) === expect, s"wrong survivor row for '$text'")
    }
  }

  test("null text routes through the groupBy lane, never dropped") {
    val docs = Seq((1L, Option("x y z")), (2L, None), (3L, None))
      .toDF("doc_id", "text")
    val out = BloomDedup.dedup(docs, "doc_id", "text")
    // md5(null) is null: both null docs group together.
    val nullRow = out.filter(col("text_hash").isNull).collect()
    assert(nullRow.length === 1)
    assert(nullRow.head.getLong(0) === 2L && nullRow.head.getLong(1) === 2L)
    assert(out.count() === 2L)
  }

  test("plan shape: exactly one exchange — only the candidate lane shuffles") {
    val out = graft.queries.NorthStar.dedupExactBloom(spark, sf0001)
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected 1 exchange, plan:\n$plan")
  }

  test("fpp = 1 degrades gracefully: everything shuffles, result unchanged") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "text")
    val out = BloomDedup.dedup(docs, "doc_id", "text", fpp = 0.99)
      .orderBy("keep_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 2L), (3L, 1L)))
  }
}
