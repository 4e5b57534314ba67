package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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
  * Scale: only (id, name, block) tuples shuffle, keyed on the block —
  * per-block work is quadratic in block size, so the block design
  * bounds the join; levenshtein is a codegen'd expression evaluated
  * only inside blocks.
  */
object FuzzyJoin {

  /** Within-block pairs (id_a < id_b) with levenshtein(name_a, name_b)
    * ≤ `maxDist`. `blockKey` is any deterministic expression over the
    * row (substring, phonetic code, normalized prefix).
    */
  def blockedPairs(df: DataFrame, idCol: String, nameCol: String,
      blockKey: Column, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val keyed = df.select(col(idCol).as("id"), col(nameCol).as("name"),
      blockKey.as("blk"))
      .repartition(col("blk")) // one exchange feeds both self-join sides
    keyed.alias("a").join(keyed.alias("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
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
}
