package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Exact duplicated-substring removal (Lee et al. suffix-array dedup
  * semantics via sliding windows + interval merge).
  */
class SubstrDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val L = 3

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("a shared run longer than the window is removed as ONE maximal span") {
    // Docs 1 and 2 share a 5-token run; with L=3 that is three
    // duplicated windows whose union must merge to one span of 5.
    val d = docs(
      1L -> "a b c d e x1 y1 z1",
      2L -> "p2 q2 a b c d e r2")
    val spans = SubstrDedup.spans(d, "doc_id", "text", L).collect()
    assert(spans.length === 1)
    val r = spans.head
    assert(r.getLong(0) === 2L) // doc 1 is canonical (min doc, pos)
    assert(r.getLong(1) === 2L) // 0-based start after p2 q2
    assert(r.getLong(2) === 5L) // maximal run, not window-sized pieces
  }

  test("canonical first occurrence keeps its text; the duplicate is cut") {
    val d = docs(
      1L -> "a b c d e x1 y1 z1",
      2L -> "p2 q2 a b c d e r2")
    val out = SubstrDedup.dedup(d, "doc_id", "text", L)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("clean_text") === "a b c d e x1 y1 z1")
    assert(out(0).getAs[Long]("n_removed") === 0L)
    assert(out(1).getAs[String]("clean_text") === "p2 q2 r2")
    assert(out(1).getAs[Long]("n_removed") === 5L)
    assert(out(1).getAs[Long]("n_tokens") === 8L)
  }

  test("within-document repeat: first occurrence survives, second is cut") {
    val d = docs(3L -> "u v w m3 u v w n3")
    val out = SubstrDedup.dedup(d, "doc_id", "text", L).collect().head
    assert(out.getAs[String]("clean_text") === "u v w m3 n3")
    assert(out.getAs[Long]("n_removed") === 3L)
  }

  test("two disjoint duplicated regions stay two spans") {
    val d = docs(
      1L -> "a b c GAP1 GAP2 GAP3 d e f",
      2L -> "a b c s2 t2 u2 v2 w2 d e f")
    val spans = SubstrDedup.spans(d, "doc_id", "text", L)
      .filter($"doc_id" === 2L).orderBy("span_start").collect()
    assert(spans.map(r => (r.getLong(1), r.getLong(2))).toSeq ===
      Seq((0L, 3L), (8L, 3L)))
  }

  test("documents shorter than the window and unique documents pass through") {
    val d = docs(
      1L -> "a b",                 // shorter than L: no windows
      2L -> "q r s t u")           // unique: no duplicated windows
    val out = SubstrDedup.dedup(d, "doc_id", "text", L)
      .orderBy("doc_id").collect()
    assert(out.forall(_.getAs[Long]("n_removed") == 0L))
    assert(out(0).getAs[String]("clean_text") === "a b")
    assert(out(1).getAs[String]("clean_text") === "q r s t u")
  }

  test("a fully duplicated document survives as an empty-text row") {
    val d = docs(
      1L -> "a b c d",
      2L -> "a b c d")
    val out = SubstrDedup.dedup(d, "doc_id", "text", L)
      .orderBy("doc_id").collect()
    assert(out.length === 2) // row loss would shrink the manifest
    assert(out(0).getAs[String]("clean_text") === "a b c d")
    assert(out(1).getAs[String]("clean_text") === "")
    assert(out(1).getAs[Long]("n_removed") === 4L)
  }

  test("overlapping spans from DIFFERENT duplicated windows merge") {
    // Doc 30 duplicates doc 10's prefix and doc 20's suffix so the two
    // marked regions overlap inside doc 30 and must merge into one.
    val d = docs(
      10L -> "a b c d x0 y0",
      20L -> "c d e f z0 w0",
      30L -> "m3 a b c d e f n3")
    val spans = SubstrDedup.spans(d, "doc_id", "text", L)
      .filter($"doc_id" === 30L).collect()
    assert(spans.length === 1)
    assert((spans.head.getLong(1), spans.head.getLong(2)) === (1L, 6L))
  }

  test("contamination rate: fraction, multiplicity, and the integer 70% flag") {
    val corpus = docs(
      1L -> "a b c d e",       // windows: abc bcd cde -> 2 of 3 in eval
      2L -> "a b c x2 a b c",  // abc hit TWICE (multiplicity) of 5 windows
      3L -> "p q r s t",       // no overlap
      4L -> "a b c d x4")      // 2 of 3 hit -> 20/3 >= fails? 20 >= 21 no
    val eval = docs(100L -> "a b c d z9")
    val out = SubstrDedup.contaminationRate(corpus, eval, "doc_id", "text", L)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_hit") === 2L)   // abc, bcd
    assert(out(1L).getAs[Double]("hit_frac") === 0.666667)
    assert(out(1L).getAs[Boolean]("contaminated") === false) // 20 < 21
    assert(out(2L).getAs[Long]("n_hit") === 2L)   // abc at pos 0 AND pos 4
    assert(out(3L).getAs[Long]("n_hit") === 0L)
    assert(out(3L).getAs[Boolean]("contaminated") === false)
    assert(out(4L).getAs[Long]("n_hit") === 2L)   // abc, bcd
  }

  test("contamination rate: a mostly-leaked document is flagged") {
    val corpus = docs(1L -> "a b c d e f")  // 4 windows, all in eval
    val eval = docs(100L -> "a b c d e f zz")
    val out = SubstrDedup.contaminationRate(corpus, eval, "doc_id", "text", L)
      .collect().head
    assert(out.getAs[Long]("n_hit") === 4L)
    assert(out.getAs[Boolean]("contaminated") === true)
  }

  test("fixture run is non-empty and mass-conserving at sf0.001") {
    val docsDf = spark.read.parquet(s"$sf0001/documents.parquet")
    val out = SubstrDedup.dedup(docsDf, "doc_id", "text", 8)
    val agg = out.agg(
      count(lit(1)).as("n"),
      sum("n_removed").as("rem"),
      sum(when(size(split(trim(col("clean_text")), "\\s+")) +
        col("n_removed") =!= col("n_tokens") &&
        length(col("clean_text")) > 0, 1).otherwise(0)).as("bad"))
      .collect().head
    assert(agg.getAs[Long]("n") === docsDf.count())
    assert(agg.getAs[Long]("rem") > 0L) // near-dup fixture must trigger it
    assert(agg.getAs[Long]("bad") === 0L) // kept + removed = total tokens
  }

  test("a doc id outside [0, 2^31) fails loudly instead of silently wrapping") {
    // 2^31 would overflow the id*2^32+pos BIGINT packing; the guard
    // must raise, not pick a wrapped canonical occurrence.
    val bad = docs((1L << 31, "a b c d a b c d"), (1L, "a b c d x"))
    val e = intercept[Exception] {
      SubstrDedup.dedup(bad, "doc_id", "text", L).collect()
    }
    assert(e.getMessage.contains("not packable") ||
      Option(e.getCause).exists(_.getMessage.contains("not packable")))
    // In-range ids are untouched by the guard.
    val ok = docs((Int.MaxValue.toLong, "a b c d a b c d"))
    assert(SubstrDedup.dedup(ok, "doc_id", "text", L).count() === 1L)
  }
}
