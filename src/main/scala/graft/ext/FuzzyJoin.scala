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
    val base = df.select(col(idCol).as("id"), col(nameCol).as("name"),
      blockKey.as("blk"))
    if (maxDist == 1) return fastSs1Pairs(base, blockCap)
    tiledPairs(base, blockCap)
      .select(
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.name").as("name_a"), col("b.name").as("name_b"),
        levenshtein(col("a.name"), col("b.name")).as("dist"),
        // Nondeterministic barrier (the quality_filter pattern):
        // without it PushPredicateThroughNonJoin re-inlines `dist`
        // into the JOIN CONDITION, where it evaluates before the
        // id_a < id_b conjunct on every hash-bucket pair (measured
        // 2x slower than this shape at sf1 despite the barrier's
        // codegen exclusion).
        monotonically_increasing_id().as("__barrier"))
      .filter(col("dist") <= maxDist && col("__barrier") >= 0)
      .drop("__barrier")
  }

  /** FastSS deletion-neighborhood candidates for the maxDist = 1 case —
    * EXACT, and the result is identical to the block-cross verify: two
    * strings are within edit distance 1 only if they share a key in
    * {name} ∪ {name minus one character} (equal names share the
    * identity key; a substitution at position i makes the two del-i
    * variants equal; a deletion makes the shorter name itself one of
    * the longer's del keys). Key sharing is a SUPERSET of true pairs
    * (two different deletions can collide, e.g. "xy"/"yx" share "y"),
    * so the levenshtein verify still gates every emitted pair — the
    * oracle contract is untouched.
    *
    * Why: the block-cross path verifies Θ(block²) candidate pairs.
    * On the fixture's 100-name blocks that is ~50× the true pair
    * count — sf1 decomposition measured 18.5 s of which ~14 s was
    * candidate verification. Del-key buckets, by contrast, contain
    * only near-identical strings, so candidate mass tracks the TRUE
    * match count (the same property PPJoin's prefix filter buys for
    * set similarity): sub-second verify on the same fixture. The
    * trade is a length+1 key fan-out exchange (L+1 short keys per
    * row) — linear in corpus size, shuffle-friendly, and the dedup
    * of multi-key collisions is a distinct() on the candidate-pair
    * frame, bounded by candidate mass.
    *
    * Per-task bounds still hold: keys ride the same [[chunked]]
    * salting on the composite (block, del-key), so a pathological
    * bucket (e.g. one name duplicated n times — whose n² pairs are
    * all TRUE matches and irreducible) tiles into ≤ cap² cells
    * exactly like oversized blocks do on the cross path.
    */
  private def fastSs1Pairs(base: DataFrame, blockCap: Int): DataFrame = {
    val dels = base
      .withColumn("dkey", explode(array_union(
        array(col("name")),
        expr("""transform(sequence(1, length(name)),
               |  i -> concat(substring(name, 1, i - 1), substring(name, i + 1)))"""
          .stripMargin))))
      .select(col("id"), col("name"),
        concat_ws("\u0001", col("blk"), col("dkey")).as("blk"))
    tiledPairs(dels, blockCap)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.name").as("name_a"), col("b.name").as("name_b"))
      .distinct()
      // Same barrier shape as the cross path above: without it the
      // levenshtein filter (referencing only the distinct's grouping
      // columns) pushes BELOW the dedup into the join condition, where
      // it evaluates on every pre-distinct multi-key collision before
      // the cheap conjuncts; and dist computes once, not twice.
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).as("dist"),
        monotonically_increasing_id().as("__barrier"))
      .filter(col("dist") <= 1 && col("__barrier") >= 0)
      .drop("__barrier")
  }

  /** All within-block unordered pairs (`a.id < b.id`) of a frame with
    * columns `id` (orderable) and `blk` (the block key), under the
    * chunk-cell tiling — the per-task-bounded self-join every blocked
    * pair operator in this package shares (edit-distance blocks here,
    * identical-hash clusters and band buckets in [[ImageHash]]). A row
    * in chunk k serves as the LEFT of cells (k, j≥k) and the RIGHT of
    * cells (i≤k, k); every unordered chunk pair meets in exactly one
    * cell, so each candidate pair is generated once and no task ever
    * exceeds ~cap² comparisons regardless of block-key skew. Returns
    * the joined frame with `a.*`/`b.*` qualifiers intact.
    */
  private[ext] def tiledPairs(base: DataFrame, cap: Int,
      symmetric: Boolean = false): DataFrame = {
    val keyed = chunked(base, cap)
    val lhs = keyed.withColumn("cj", explode(sequence(col("chunk"), col("nchunks") - 1)))
    // symmetric = true: `nchunks - nchunks` IS zero — spelled that way
    // so both join sides require the same columns from the chunk
    // window, its exchange canonicalizes equal on both sides and
    // ReuseExchange computes the window ONCE (the caller must keep its
    // other column references symmetric too). With a bare lit(0)
    // column pruning drops `nchunks` from this side only and each side
    // computes its own window — which the blocked/FastSS callers
    // PREFER: the two single-task window stages overlap at fixture
    // scale, and their duplicated work is one map-side pass (measured:
    // fuzzy_match 1.08 → 1.40 s at 32 cores under the symmetric form).
    val rhs = keyed.withColumn("ci",
      explode(sequence(
        if (symmetric) col("nchunks") - col("nchunks") else lit(0),
        col("chunk"))))
    lhs.alias("a").join(rhs.alias("b"),
      col("a.blk") === col("b.blk") &&
        col("a.chunk") === col("b.ci") && col("a.cj") === col("b.chunk") &&
        col("a.id") < col("b.id"))
  }

  /** Folded two-lane Hamming near-dup engine over PACKED 64-bit
    * fingerprints — the shared core of [[TextAnalysis.simhashPairsFromFingerprints]]
    * and [[ImageHash.nearDup]] (r17: previously each ran
    * [[tiledPairs]] twice — once for the identical-fingerprint
    * "within" lane over members, once for the banded candidate lane
    * over representatives — paying two chunk windows, two cell
    * self-joins and a candidate `distinct`; the two lanes now ride ONE
    * lane-tagged frame through one window + one join, guide §2.4).
    *
    * Inputs: `members` (id, fp) — pre-exchanged by the caller so the
    * upstream fingerprint computation materializes once — and `groups`
    * (fp, rep), its identical-fingerprint collapse. `bandKeys(fp)` are
    * the per-band LSH keys (pigeonhole-complete for `maxHamming` by the
    * caller's contract).
    *
    * Lane fold: within-lane rows block on "W:<fp>" (identical
    * fingerprints), band-lane rows on "B:<band>:<key>" — disjoint block
    * spaces, so one [[tiledPairs]] pass emits exactly the union of both
    * lanes' pairs, under the same ≤ cap² per-task bound. Hamming
    * computes directly from the carried fingerprints (within pairs are
    * 0 by identity), and multi-band candidate duplicates drop via the
    * FIRST-SHARED-BAND rule — band j emits a pair only when no band
    * i < j also matched, a local recomputation of the pair's key
    * columns — instead of a candidate-wide `distinct` exchange.
    *
    * Returned pre-expansion frame: (band, id_a, id_b, hamming) with
    * band = -1 for within-lane MEMBER pairs and the matching band for
    * cross-group REP pairs (each qualifying rep pair exactly once).
    */
  private[ext] def hammingLanePairs(
      members: DataFrame, groups: DataFrame,
      bandKeys: Column => Seq[Column],
      maxHamming: Int, bucketCap: Int): DataFrame = {
    val nBands = bandKeys(col("fp")).size
    val wLane = members.select(col("id"), col("fp"),
      concat_ws(":", lit("W"), col("fp")).as("blk"), lit(-1).as("band"))
    val bLane = groups
      .select(col("rep").as("id"), col("fp"),
        posexplode(array(bandKeys(col("fp")): _*)).as(Seq("band", "bkey")))
      .select(col("id"), col("fp"),
        concat_ws(":", lit("B"), col("band"), col("bkey")).as("blk"), col("band"))
    def firstBandOf(fa: Column, fb: Column): Column =
      coalesce((0 until nBands).map(j =>
        when(bandKeys(fa)(j) === bandKeys(fb)(j), lit(j))): _*)
    tiledPairs(wLane.unionByName(bLane), bucketCap, symmetric = true)
      // a.band = b.band is ALWAYS true (band is a function of the block
      // key the join equates) — the conjunct is here so both join sides
      // require the band column and the two chunk-window exchanges stay
      // canonically equal (same reuse argument as tiledPairs' rhs
      // sequence bound).
      .filter(col("a.band") === col("b.band") &&
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))) <= maxHamming &&
        (col("a.band") === -1 || col("a.band") === firstBandOf(col("a.fp"), col("b.fp"))))
      .select(col("a.band").as("band"),
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).cast("long").as("hamming"))
  }

  /** [[hammingLanePairs]] expanded to member-level output (id_a, id_b,
    * hamming). The two consumers (the within-lane projection and the
    * cross-lane rep→member expansion) each take a copy of the lane-fold
    * subtree with their lane filter PUSHED onto the probe side of the
    * cell join — deliberate: every exchange below (the fingerprint
    * exchange, the shared chunk window, the cell join's build side) is
    * canonically identical across the copies and ReuseExchange folds
    * them, so the duplicated work is exactly one extra probe pass over
    * the already-shuffled window output, with each pass probing ONLY
    * its own lane's rows. The alternative — materializing the verified
    * pairs through one more exchange both consumers share — was built
    * and measured SLOWER at fixture scale (it adds a sequential stage
    * boundary where the two lane branches previously overlapped) while
    * saving only the second probe pass; see OPTIMIZATION_r17.md.
    * Cross pairs expand arithmetically AFTER the Hamming verify,
    * exactly as before: only true output pairs materialize from
    * cluster mass.
    */
  private[ext] def hammingPairs(
      members: DataFrame, groups: DataFrame,
      bandKeys: Column => Seq[Column],
      maxHamming: Int, bucketCap: Int): DataFrame = {
    val verified =
      hammingLanePairs(members, groups, bandKeys, maxHamming, bucketCap)
    val within = verified.filter(col("band") === -1)
      .select(col("id_a"), col("id_b"), col("hamming"))
    val mem = members.join(groups, "fp").select(col("rep"), col("id"))
    val cross = verified.filter(col("band") >= 0)
      .select(col("id_a").as("rep_a"), col("id_b").as("rep_b"), col("hamming"))
      .join(mem.select(col("rep").as("rep_a"), col("id").as("ma")), "rep_a")
      .join(mem.select(col("rep").as("rep_b"), col("id").as("mb")), "rep_b")
      .select(least(col("ma"), col("mb")).as("id_a"),
        greatest(col("ma"), col("mb")).as("id_b"), col("hamming"))
    within.unionByName(cross)
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
