package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact-complete set-similarity join via prefix filtering (the
  * PPJoin/AllPairs family) — the "n-gram Jaccard" dedup path that is
  * DETERMINISTICALLY complete, complementing the probabilistic
  * MinHash-LSH path in [[NearDup]]: LSH trades a recall tail for
  * constant work per document; prefix filtering returns EVERY pair with
  * Jaccard ≥ θ, with work that adapts to how similar the corpus
  * actually is.
  *
  * Pipeline: word n-gram shingle sets (hashed once, as in [[NearDup]])
  * → global rare-first token ordering (corpus document frequency) →
  * per-document prefix of the (|s| − ⌈θ·|s|⌉ + 1) rarest shingles →
  * inverted-index self-join on prefix shingles + length filter → exact
  * Jaccard verification of candidates.
  *
  * Completeness (why no pair above θ is ever missed): order every set
  * by one shared total order. If J(a,b) ≥ θ then the overlap
  * o = |a∩b| satisfies o ≥ θ·|a∪b| ≥ θ·max(|a|,|b|), and o is an
  * integer, so o ≥ ⌈θ·max(|a|,|b|)⌉ =: α. A set's last α−1 elements
  * cannot contain all o ≥ α common elements, so some common element
  * lies within the first |a|−α+1 of a AND the first |b|−α+1 of b;
  * both are ≤ the kept prefix lengths (α ≥ ⌈θ·|a|⌉ and ≥ ⌈θ·|b|⌉), so
  * the kept prefixes share an element and the pair becomes a
  * candidate. ANY shared total order satisfies this — the
  * document-frequency (rare-first) order is purely the performance
  * lever: the prefix holds each document's rarest shingles, so
  * inverted-index buckets stay small where the vocabulary is heavy.
  *
  * Scale design (100 TB):
  *  - shingle hashing is map-only and happens once; raw text never
  *    shuffles (ids + 8-byte shingle hashes only);
  *  - the document-frequency table is a two-phase hash aggregate: the
  *    exchange carries one row per (map partition, distinct shingle),
  *    bounded by vocabulary, not the token stream;
  *  - attaching frequencies is the one corpus-wide exchange (shuffle
  *    on shingle hash), the same volume class as one LSH banding pass;
  *  - only the PREFIX (≈ (1−θ)·|s| + 1 shingles/doc) enters the
  *    inverted-index self-join, keyed on the shingle hash; an explicit
  *    repartition on the key lets AQE reuse one exchange for both
  *    sides of the self-join;
  *  - the length filter (min ≥ θ·max, a consequence of J ≥ θ) prunes
  *    cross-size candidates before the verify join;
  *  - candidate verification shuffles candidate ids only, a volume set
  *    by true similarity structure, not corpus size².
  */
object SetSimJoin {

  /** All document pairs (id_a < id_b) with exact Jaccard ≥ `threshold`
    * over distinct word-`shingleLen`-gram sets. Exact and complete —
    * equality with brute-force all-pairs is spec-asserted, not
    * probabilistic.
    *
    * Precondition: `idCol` values are UNIQUE (the corpus contract every
    * fixture table satisfies). The single-join verify regroups each
    * candidate pair's two probe rows by id with first(ignoreNulls);
    * duplicate ids would collapse to one arbitrarily-chosen shingle
    * set per side instead of one verified row per duplicate
    * combination.
    */
  def jaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      shingleLen: Int = NearDup.DefaultShingleLen): DataFrame = {
    require(threshold > 0 && threshold < 1, s"threshold in (0,1), got $threshold")
    // The shingle subtree is computed exactly TWICE — once fused into
    // the inverted-index pipeline below, once streamed through the
    // single verify join at the bottom — and never exchanged whole.
    // Two rejected alternatives, both measured (OPTIMIZATION_r16.md):
    // the r15 shape re-shingled the text a THIRD time (one pass per
    // verify side), and a doc_id-keyed exchange shared by the verify
    // sides won ~10% at sf0.1 but regressed ×1.3 at sf10 — a
    // corpus-wide shuffle of the hash ARRAYS grows linearly while the
    // map-only re-shingle it saves stays cheap, exactly the wrong
    // trade at 100 TB.
    val sh = NearDup.shingleSets(docs, idCol, textCol, shingleLen)

    // Corpus document frequency per shingle hash — the shared total
    // order is (df ASC, hash ASC); both components are data-determined,
    // so the order (hence the candidate set, hence — after the lossless
    // filter — the result) is deterministic.
    val exploded = sh.select(col("doc_id"), size(col("hs")).as("sz"),
      explode(col("hs")).as("h"))
    val freq = exploded.groupBy(col("h")).agg(count(lit(1)).as("df"))

    // Rank each document's shingles rare-first with a window — one
    // per-doc sort, no per-doc struct arrays materialized (profiled
    // ~2× cheaper than collect_list + sort_array + re-explode at
    // sf0.1) — and keep only the prefix: the first
    // |s| − ⌈θ·|s|⌉ + 1 positions. The rank is total (df ties break on
    // the distinct-within-doc hash), so the prefix is deterministic.
    // The df attach join has a vocabulary-sized build side — AQE
    // broadcasts it when small; at corpus scale it is a keyed shuffle
    // of the shingle stream, the price of a corpus-global ordering.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("h"))
    val prefix = exploded.join(freq, "h")
      .withColumn("pos", row_number().over(w))
      .filter(col("pos") <=
        col("sz") - ceil(col("sz") * lit(threshold)).cast("int") + 1)
      .select(col("doc_id"), col("sz"), col("pos"), col("h"))
      .repartition(col("h")) // one exchange feeds both self-join sides (AQE reuse)

    // Positional filter (PPJoin): a match at sorted positions
    // (pos_a, pos_b) bounds the overlap — every common element sits at
    // position ≥ pos in BOTH sets once one common element does, for
    // the FIRST common element — by
    //   o ≤ 1 + min(sz_a − pos_a, sz_b − pos_b),
    // while J ≥ θ requires o ≥ θ/(1+θ)·(sz_a+sz_b). Requiring the
    // bound only per matched row is sound because the pair survives if
    // ANY match passes, and the pair's FIRST common token (which the
    // prefix theorem guarantees lies in both prefixes) has the
    // smallest positions, hence the loosest bound. This also implies
    // the min≥θ·max length filter, which AQE can still push as a
    // cheap pre-check.
    val overlapNeed = lit(threshold / (1.0 + threshold)) *
      (col("a.sz") + col("b.sz")).cast("double")
    val overlapBound = (lit(1) +
      least(col("a.sz") - col("a.pos"), col("b.sz") - col("b.pos"))).cast("double")
    val cand = prefix.alias("a").join(prefix.alias("b"),
        col("a.h") === col("b.h") &&
          col("a.doc_id") < col("b.doc_id") &&
          least(col("a.sz"), col("b.sz")).cast("double") >=
            lit(threshold) * greatest(col("a.sz"), col("b.sz")) &&
          overlapBound >= overlapNeed)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()

    val jac = size(array_intersect(col("hs_a"), col("hs_b"))).cast("double") /
      size(array_union(col("hs_a"), col("hs_b"))).cast("double")
    // Verify through ONE join: each candidate pair explodes into two
    // probe rows, joins the shingle stream once on doc_id, and regroups
    // to (hs_a, hs_b). vs the r15 two-join shape this halves the verify
    // passes over the corpus (sh streams once, not once per side) and
    // the only arrays that ever shuffle are the MATCHED candidates'
    // (candidate-bounded, never corpus-bounded) in the regroup — each
    // group holds exactly two rows, one per role, so first(ignoreNulls)
    // is deterministic.
    val probes = cand.select(col("id_a"), col("id_b"),
      explode(array(col("id_a"), col("id_b"))).as("doc_id"))
    probes.join(sh, "doc_id")
      .groupBy(col("id_a"), col("id_b"))
      .agg(
        first(when(col("doc_id") === col("id_a"), col("hs")), ignoreNulls = true)
          .as("hs_a"),
        first(when(col("doc_id") === col("id_b"), col("hs")), ignoreNulls = true)
          .as("hs_b"))
      .filter(jac >= threshold)
      .select(col("id_a"), col("id_b"), round(jac, 6).as("jaccard"))
  }

  /** Exact-complete set-CONTAINMENT join: every (needle, corpus) pair
    * with C(needle → corpus) = |N∩C| / |N| ≥ `threshold` over distinct
    * word-`shingleLen`-gram sets. Containment is the decontamination
    * statistic Jaccard can't express: a short eval prompt fully inside
    * a long training document has tiny Jaccard (the union is
    * corpus-document-sized) but containment 1.0 — exactly the leak
    * that matters.
    *
    * Completeness: if C ≥ θ then the overlap o = |N∩C| ≥ ⌈θ·|N|⌉ (o
    * is an integer). Under ANY fixed total order of N's shingles, N's
    * last ⌈θ·|N|⌉ − 1 positions cannot hold all o common elements, so
    * some common element lies in N's first |N| − ⌈θ·|N|⌉ + 1 — the
    * kept prefix. The CORPUS side indexes every shingle (containment
    * puts no lower bound on o relative to |C|, so no corpus prefix is
    * sound), hence the prefix hit is guaranteed to surface the pair.
    * As in [[jaccardPairs]], the corpus-df rare-first order is purely
    * the performance lever: needle prefixes hold their rarest
    * shingles, so inverted-index buckets stay small. A needle shingle
    * absent from the corpus gets df 0 — rarest of all, which is
    * right: it probes an empty bucket and costs nothing.
    *
    * Scale shape: the corpus index is one shingle-keyed exchange of
    * (id, 8-byte hash) rows — raw text never shuffles; the needle
    * side is eval-set-sized (small by nature of the use case); the
    * candidate and verify volumes are bounded by true shared-shingle
    * structure, never |needles| × |corpus|.
    */
  def containmentPairs(
      needles: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      shingleLen: Int = NearDup.DefaultShingleLen): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1], got $threshold")
    // Same single-computation discipline as [[jaccardPairs]]: each
    // side's (expensive, text-scanning) shingle subtree materializes
    // through ONE id-keyed exchange that the inverted-index branch and
    // the verify join both reuse — the r16 before-plan shingled the
    // corpus three times and the needles twice (10 parquet scans).
    // The needle-side keying also feeds the prefix window (partitioned
    // by needle_id) without a further exchange.
    // As in [[jaccardPairs]], the not-null filters below the exchanges
    // keep every consumer's exchange subtree canonically identical
    // (the verify joins would otherwise push an inferred
    // IsNotNull(id) below their copy only, defeating ReuseExchange);
    // null-id rows cannot reach the output in any case.
    val shN = NearDup.shingleSets(needles, idCol, textCol, shingleLen)
      .select(col("doc_id").as("needle_id"), col("hs"))
      .filter(col("needle_id").isNotNull && col("hs").isNotNull &&
        size(col("hs")) > 0)
      .repartition(col("needle_id"))
    val shC = NearDup.shingleSets(corpus, idCol, textCol, shingleLen)
      .select(col("doc_id").as("corpus_id"), col("hs"))
      .filter(col("corpus_id").isNotNull && col("hs").isNotNull &&
        size(col("hs")) > 0)
      .repartition(col("corpus_id"))

    val corpusIdx = shC.select(col("corpus_id"), explode(col("hs")).as("h"))
    // count(corpus_id), not count(1): keeps corpus_id in the df
    // branch's column set, so column pruning cannot specialize (and
    // thereby un-share) its copy of the corpus exchange; equal counts,
    // since corpus_id is non-null by the filter above.
    val freq = corpusIdx.groupBy(col("h")).agg(count(col("corpus_id")).as("df"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("needle_id")).orderBy(col("df"), col("h"))
    val prefix = shN
      .select(col("needle_id"), size(col("hs")).as("sz"), explode(col("hs")).as("h"))
      .join(freq, Seq("h"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .withColumn("pos", row_number().over(w))
      .filter(col("pos") <=
        col("sz") - ceil(col("sz") * lit(threshold)).cast("int") + 1)
      .select(col("needle_id"), col("h"))

    val cand = prefix.join(corpusIdx, "h")
      .select(col("needle_id"), col("corpus_id")).distinct()

    val cont = size(array_intersect(col("hs_n"), col("hs_c"))).cast("double") /
      size(col("hs_n")).cast("double")
    cand
      .join(shN.select(col("needle_id"), col("hs").as("hs_n")), "needle_id")
      .join(shC.select(col("corpus_id"), col("hs").as("hs_c")), "corpus_id")
      .filter(cont >= threshold)
      .select(col("needle_id"), col("corpus_id"), round(cont, 6).as("containment"))
  }
}
