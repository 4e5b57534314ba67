package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer: integer Viterbi, deterministic ties, hard-EM
  * refit mass conservation.
  */
class UnigramLmSpec extends SparkTestBase {

  test("viterbi picks the min-total-cost segmentation") {
    // "abcd": 'abcd' costs 5; 'ab'+'cd' costs 2+2=4 -> split wins.
    val costs = Map("abcd" -> 5L, "ab" -> 2L, "cd" -> 2L,
      "a" -> 9L, "b" -> 9L, "c" -> 9L, "d" -> 9L)
    assert(UnigramLm.viterbi("abcd", costs) === (4L, "ab|cd"))
  }

  test("a single cheap piece beats any split") {
    val costs = Map("abcd" -> 1L, "ab" -> 2L, "cd" -> 2L,
      "a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 1L)
    assert(UnigramLm.viterbi("abcd", costs) === (1L, "abcd"))
  }

  test("equal-cost ties break on the lexicographically smaller path") {
    // 'ab'+'cd' and 'abc'+'d' both cost 4. The separator '|' (0x7C)
    // sorts AFTER every lowercase letter, so "abc|d" < "ab|cd" in the
    // bytewise order both engines use — longer first pieces win ties.
    val costs = Map("ab" -> 2L, "cd" -> 2L, "abc" -> 2L, "d" -> 2L,
      "a" -> 9L, "b" -> 9L, "c" -> 9L)
    assert(UnigramLm.viterbi("abcd", costs) === (4L, "abc|d"))
  }

  test("single characters keep every word segmentable") {
    val costs = Map("x" -> 3L, "y" -> 3L, "z" -> 3L)
    assert(UnigramLm.viterbi("xyz", costs) === (9L, "x|y|z"))
  }

  test("refit conserves piece-use mass: sum(new_cnt) = sum(wc * n_pieces)") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "alpha beta alpha"),
      (2L, "beta gamma")).toDF("doc_id", "text")
    val seg = UnigramLm.segmentWords(docs, "text")
    val used = seg.agg(sum($"wc" * $"n_pieces")).collect().head.getLong(0)
    val refit = UnigramLm.refit(docs, "text")
      .agg(sum($"new_cnt")).collect().head.getLong(0)
    assert(refit === used)
  }

  test("tokenize rolls up exactly the per-word segmentations") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "aa bb aa")).toDF("doc_id", "text")
    val seg = UnigramLm.segmentWords(docs, "text")
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    val out = UnigramLm.tokenize(docs, "doc_id", "text").collect().head
    assert(out.getAs[Long]("n_words") === 3L)
    assert(out.getAs[Long]("n_pieces") ===
      2 * seg("aa")._1 + seg("bb")._1)
    assert(out.getAs[Long]("total_bits") ===
      2 * seg("aa")._2 + seg("bb")._2)
  }

  test("fixture smoke: frequent multi-char pieces reduce fertility below chars") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val seg = UnigramLm.segmentWords(docs, "text")
    val r = seg.agg(
      sum(col("wc") * col("n_pieces")).as("pieces"),
      sum(col("wc") * length(col("word"))).as("chars")).collect().head
    // The unigram model must compress: fewer pieces than characters.
    assert(r.getLong(0) < r.getLong(1))
  }
}
