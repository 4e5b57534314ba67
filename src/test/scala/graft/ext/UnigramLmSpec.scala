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

  test("viterbi walks codepoints: a 4-codepoint supplementary piece is reachable") {
    // "😀😀😀😀" is 4 codepoints but 8 UTF-16 units; the whole-word
    // piece must be usable (a UTF-16-unit DP could never reach it).
    val w = "😀" * 4
    val costs = Map(w -> 1L, "😀" -> 9L)
    assert(UnigramLm.viterbi(w, costs) === (1L, w))
  }

  test("utf8Less orders by UTF-8 bytes, not UTF-16 units") {
    // U+E000 (UTF-8 EE 80 80) vs U+1F600 (UTF-8 F0 9F 98 80): UTF-8
    // puts the supplementary char LAST; Java's compareTo (UTF-16 units
    // 0xE000 vs surrogate 0xD83D) puts it FIRST. The oracle's ORDER BY
    // is memcmp, so the engine must use the UTF-8 order.
    val bmp = "\uE000"
    val supp = "😀"
    assert(UnigramLm.utf8Less(bmp, supp))
    assert(!UnigramLm.utf8Less(supp, bmp))
    assert(bmp.compareTo(supp) > 0) // the divergence being guarded
  }

  test("cap binds at fixture scale: candidate universe exceeds MaxVocab") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val universe = UnigramLm.piecesOf(UnigramLm.words(docs, "text"))
      .filter(length(col("piece")) > 1).count()
    assert(universe > UnigramLm.MaxVocab,
      s"fixture multi-char candidates ($universe) must exceed the cap")
    val inv = UnigramLm.pieceInventory(docs, "text")
    assert(inv.filter(length(col("piece")) > 1).count() ===
      UnigramLm.MaxVocab.toLong)
  }

  test("sub-cap corpus is unchanged by the cap (counts and costs)") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "abba abc"), (2L, "abba")).toDF("doc_id", "text")
    val w = UnigramLm.words(docs, "text")
    val universe = UnigramLm.piecesOf(w)
    assert(universe.filter(length(col("piece")) > 1).count() <
      UnigramLm.MaxVocab.toLong)
    val inv = UnigramLm.pieceInventory(docs, "text")
    // Every candidate survives with its full count: the cap did not fire.
    assert(inv.count() === universe.count())
    val joined = inv.as("i").join(universe.as("u"), Seq("piece"))
      .filter($"i.cnt" =!= $"u.cnt").count()
    assert(joined === 0L)
  }

  test("words longer than MaxWordLen are excluded from training and apply") {
    val s = spark; import s.implicits._
    val long = "x" * (UnigramLm.MaxWordLen + 1)
    val docs = Seq((1L, s"ok $long ok")).toDF("doc_id", "text")
    assert(UnigramLm.words(docs, "text").count() === 1L) // just "ok"
    val out = UnigramLm.tokenize(docs, "doc_id", "text").collect().head
    assert(out.getAs[Long]("n_words") === 2L)
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
