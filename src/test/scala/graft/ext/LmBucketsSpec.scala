package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** CCNet-style bigram bit-length cross-entropy bucketing. */
class LmBucketsSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: (Long, String, String, Boolean)*) = {
    val df = rows.toDF("doc_id", "lang", "text", "is_ref")
    LmBuckets.buckets(df, "doc_id", "text", "lang", col("is_ref"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("bits_x1e6"), r.getAs[String]("bucket"))).toMap
  }

  test("reference-like text scores fewer bits than off-distribution text") {
    val out = run(
      (1L, "en", "the cat sat on the mat", true),
      (2L, "en", "the cat sat on the mat", false), // verbatim reference reuse
      (3L, "en", "zq xv qqq zzz vvv kkk", false))  // all-unseen bigrams
    assert(out(2L)._1 < out(3L)._1)
  }

  test("terciles cut each language into thirds, ties broken by doc id") {
    // Six identical docs in one language: every score equal, so the
    // tercile cut must fall back to doc id — 2 head, 2 middle, 2 tail.
    val docs = (1L to 6L).map(i => (i, "en", "a b c", i == 1L))
    val out = run(docs: _*)
    assert(out.values.map(_._1).toSet.size === 1)
    assert(Seq(1L, 2L).map(out(_)._2) === Seq("head", "head"))
    assert(Seq(3L, 4L).map(out(_)._2) === Seq("middle", "middle"))
    assert(Seq(5L, 6L).map(out(_)._2) === Seq("tail", "tail"))
  }

  test("languages are bucketed independently") {
    val out = run(
      (1L, "en", "the cat sat", true),
      (2L, "en", "zz qq vv", false),
      (3L, "fr", "le chat noir", true),
      (4L, "fr", "ww kk pp", false))
    // 2 docs per lang: ranks 0,1 of n=2 -> terc (3*0)/2=0, (3*1)/2=1.
    assert(out(1L)._2 === "head" || out(2L)._2 === "head")
    assert(Seq(3L, 4L).map(out(_)._2).sorted === Seq("head", "middle"))
  }

  test("documents with fewer than two tokens are excluded") {
    val out = run(
      (1L, "en", "a b c", true),
      (2L, "en", "solo", false),
      (3L, "en", "", false))
    assert(out.keySet === Set(1L))
  }

  test("bit-length cost is the add-one bigram code length") {
    // Reference "a b a b a" has bigrams (a,b) x2 and (b,a) x2, so
    // cu(a)=2, cb("a b")=2, and vocab V=2. Scoring doc "a b":
    // cost = bitlen(cu+V) - bitlen(cb+1) = bitlen(4) - bitlen(3)
    // = 3 - 2 = 1 whole bit -> bits_x1e6 = 1_000_000.
    val out = run(
      (1L, "en", "a b a b a", true),
      (2L, "en", "a b", false))
    assert(out(2L)._1 === 1000000L)
  }

  test("fixture run: every language splits into three non-empty buckets") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val out = LmBuckets.buckets(docs, "doc_id", "text", "lang",
      length(col("text")) >= lit(50))
    val counts = out.groupBy("lang", "bucket").count()
      .groupBy("lang").agg(count(lit(1)).as("nb"), sum("count").as("n"))
      .collect()
    assert(counts.nonEmpty)
    assert(counts.forall(_.getAs[Long]("nb") === 3L))
  }
}
