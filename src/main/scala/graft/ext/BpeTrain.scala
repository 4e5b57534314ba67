package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE merge-table training — the canonical tokenizer-
  * training operation of an LLM data pipeline (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units"):
  * iteratively merge the most frequent adjacent symbol pair until the
  * requested number of merges is learned.
  *
  * Scale shape (the standard one): the CORPUS-sized work is a single
  * word-frequency aggregation — after that, every merge round runs on
  * the distinct-word vocabulary (sub-linear in corpus size; bounded at
  * any scale), so 100 TB of text costs one shuffle plus N vocab-sized
  * rounds. Each round is (a) an adjacent-pair count weighted by word
  * frequency (explode + two-phase hash aggregate), (b) a 1-row argmax
  * collected to the driver — the coordination point every iterative
  * trainer has, like the k-means/IVF trainer's centroid step — and
  * (c) a map-only literal replace applying the merge, with a
  * localCheckpoint lineage cut per round (the pagerank pattern).
  *
  * Determinism: ties in pair counts break by (count desc, left asc,
  * right asc) in binary string order, so the merge table is a pure
  * function of the corpus and DuckDB replays the whole training loop
  * round for round ([[graft.queries.Tokenizer]] generates the
  * unrolled SQL).
  *
  * Encoding: every symbol is INDIVIDUALLY wrapped (`|l||o||w|`), so
  * pair (a,b) occurs as the literal `|a||b|` and merges via plain
  * string replace to `|ab|`. Because adjacent symbols share no
  * delimiter characters, left-to-right non-overlapping replace is
  * EXACTLY BPE's canonical greedy application (`aaaa` under merge
  * (a,a) → `aa aa`, not `aa a a` — a shared-delimiter encoding gets
  * this wrong), and a pair can never match inside a larger symbol.
  * Plain replace exists identically in Spark and DuckDB, which is
  * what makes the whole training loop oracle-replayable (RE2 has no
  * lookarounds, so the regex formulation would not be). Words
  * containing the delimiter are excluded up front (both engines apply
  * the same guard).
  */
object BpeTrain {

  /** One learned merge. */
  final case class Merge(merge_rank: Long, lhs: String, rhs: String,
      merged: String, pair_n: Long)

  /** The word-frequency table with initial character segmentation —
    * the only corpus-sized computation in the trainer.
    */
  def wordVocab(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .where(length(col("word")) > 0 && !col("word").contains("|"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .withColumn("enc", regexp_replace(col("word"), "(.)", "|$1|"))

  /** Adjacent-pair frequencies of the current segmentation, weighted
    * by word count. Vocab-sized: explode + partial-aggregated sum.
    */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .withColumn("__ss", array_remove(split(col("enc"), "\\|"), ""))
      .where(size(col("__ss")) >= 2)
      .select(col("n"), explode(expr(
        "transform(sequence(1, size(__ss) - 1), " +
          "j -> struct(element_at(__ss, j) AS a, element_at(__ss, j + 1) AS b))")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("n")).as("cnt"))

  /** Learn `numMerges` merges; returns (merge table, final vocab
    * segmentation). The final vocab IS the trained tokenizer applied
    * to every distinct word — the lookup table a production tokenizer
    * materializes.
    */
  def learnMerges(spark: SparkSession, docs: DataFrame, textCol: String,
      numMerges: Int): (Seq[Merge], DataFrame) = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    var vocab = wordVocab(docs, textCol).localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var rank = 1L
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val best = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (best.isEmpty) {
        exhausted = true // corpus fully merged — every word one symbol
      } else {
        val (a, b, cnt) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(rank, a, b, a + b, cnt)
        vocab = vocab
          .withColumn("enc",
            org.apache.spark.sql.functions.replace(
              col("enc"), lit(s"|$a||$b|"), lit(s"|$a$b|")))
          .localCheckpoint()
        rank += 1
      }
    }
    (merges.result(), vocab)
  }

  /** Merge table as a DataFrame (driver-built: the learned artifact is
    * inherently small, like trained k-means centroids).
    */
  def mergeTable(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF()
  }

  /** Apply an already-learned merge table to new text — tokenization
    * with merges, the inference half of the trainer. Map-only: the
    * merge list folds into one nested-replace expression evaluated
    * per word, no joins, no state.
    */
  def segmentWords(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val base = docs
      .select(col(idCol), explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .where(length(col("word")) > 0 && !col("word").contains("|"))
      .withColumn("enc", regexp_replace(col("word"), "(.)", "|$1|"))
    val applied = merges.foldLeft(col("enc")) { (c, m) =>
      org.apache.spark.sql.functions.replace(
        c, lit(s"|${m.lhs}||${m.rhs}|"), lit(s"|${m.merged}|"))
    }
    base
      .withColumn("enc", applied)
      .withColumn("n_pieces",
        (size(array_remove(split(col("enc"), "\\|"), ""))).cast("long"))
  }
}
