package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked edit-distance entity matching — the fuzzy-dedup step of an
  * entity-resolution pipeline (near-identical names/addresses/SKUs
  * that exact dedup misses). The classic blocking pattern: a cheap
  * deterministic blocking key partitions the corpus; candidate pairs
  * form only WITHIN a block; an exact edit-distance verify filters.
  *
  * Recall contract: complete for every pair the blocking key agrees
  * on, BY CONSTRUCTION — pairs split across blocks are invisible, so
  * recall is exactly the blocking assumption (e.g. "typos never hit
  * the prefix"). That is the honest production trade: choose the
  * block from the stable part of the entity. (Same epistemic shape as
  * the LSH oracles: the oracle replicates the blocking, making the
  * gate deterministic.)
  *
  * Scale: only (id, name, block) tuples shuffle, keyed on cells —
  * per-block work is quadratic in block size BY DESIGN, so a skewed
  * real-world key (one giant surname block) is the hazard at 100×.
  * Oversized blocks are therefore salted: a block of size n with cap
  * c splits into s = ⌈n/c⌉ contiguous id-ordered chunks, and the
  * self-join decomposes into the s(s+1)/2 chunk-pair CELLS that
  * tile the id_a < id_b triangle. Each cell is ≤ ⌈n/s⌉² candidate
  * work and cells hash-distribute across the cluster, so no single
  * task ever exceeds ~c² comparisons regardless of key skew. Output
  * is IDENTICAL to the uncapped join: diagonal cells filter id_a <
  * id_b, cross cells are all-pairs (chunks are id-ordered, so the
  * inequality holds by construction); `FuzzyJoinSpec` asserts the
  * equality on a planted hot block. Levenshtein is a codegen'd
  * expression evaluated only inside cells.
  */
object FuzzyJoin {

  /** Within-block pairs (id_a < id_b) with levenshtein(name_a, name_b)
    * ≤ `maxDist`. `blockKey` is any deterministic expression over the
    * row (substring, phonetic code, normalized prefix). `blockCap`
    * bounds per-task candidate work to ~cap² comparisons: blocks
    * larger than the cap are transparently salted into cells (result
    * set unchanged).
    */
  def blockedPairs(df: DataFrame, idCol: String, nameCol: String,
      blockKey: Column, maxDist: Int, blockCap: Int = 4096): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(blockCap >= 2, s"blockCap must be >= 2, got $blockCap")
    val keyed = chunked(
      df.select(col(idCol).as("id"), col(nameCol).as("name"), blockKey.as("blk")),
      blockCap)
    // A row in chunk k serves as the LEFT of cells (k, j≥k) and the
    // RIGHT of cells (i≤k, k); every unordered chunk pair meets in
    // exactly one cell, so each candidate pair is generated once.
    val lhs = keyed.withColumn("cj", explode(sequence(col("chunk"), col("nchunks") - 1)))
    val rhs = keyed.withColumn("ci", explode(sequence(lit(0), col("chunk"))))
    lhs.alias("a").join(rhs.alias("b"),
        col("a.blk") === col("b.blk") &&
          col("a.chunk") === col("b.ci") && col("a.cj") === col("b.chunk") &&
          col("a.id") < col("b.id"))
      .select(
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.name").as("name_a"), col("b.name").as("name_b"),
        levenshtein(col("a.name"), col("b.name")).as("dist"),
        // Nondeterministic barrier (the quality_filter pattern):
        // without it PushPredicateThroughNonJoin re-inlines `dist`
        // into a Filter BELOW this Project and levenshtein runs twice
        // per candidate pair — once to filter, once to emit.
        monotonically_increasing_id().as("__barrier"))
      .filter(col("dist") <= maxDist && col("__barrier") >= 0)
      .drop("__barrier")
  }

  /** Chunk assignment for salting: contiguous id-ordered chunks of at
    * most `cap` rows per block (`chunk` ∈ [0, nchunks)). Id ordering
    * is what lets cross-chunk cells skip the id_a < id_b filter —
    * every id in chunk i precedes every id in chunk j > i. One
    * exchange + sort on the block key (the same exchange the
    * un-salted join needed); s = 1 for every block within the cap.
    */
  private[ext] def chunked(keyed: DataFrame, cap: Int): DataFrame = {
    val byBlock = Window.partitionBy(col("blk"))
    keyed
      .withColumn("rn", row_number().over(byBlock.orderBy(col("id"))) - 1)
      .withColumn("n", count(lit(1)).over(byBlock))
      .withColumn("nchunks", expr(s"CAST((n + ${cap}L - 1) DIV ${cap}L AS INT)"))
      .withColumn("chunk", expr("CAST((CAST(rn AS BIGINT) * nchunks) DIV n AS INT)"))
      .drop("rn", "n")
  }
}
