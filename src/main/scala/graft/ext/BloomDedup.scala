package graft.ext

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-pruned exact deduplication — the two-pass shape CommonCrawl-
  * scale dedups use to keep provably-unique documents OUT of the
  * exchange entirely.
  *
  * Plain exact dedup (`dedup_exact`) shuffles one (digest, id, count)
  * row per distinct digest per map partition: map-side partial
  * aggregation already collapses within-partition copies, but a digest
  * unique to the whole corpus — the overwhelming majority of a typical
  * crawl — still crosses the wire once. At 1000 executors that
  * cross-partition-unique traffic IS the shuffle.
  *
  * This operator runs one extra pass that builds a conservative
  * "possibly duplicated" Bloom filter, then routes:
  *
  *   - keys NOT in the filter are GLOBALLY unique with certainty
  *     (the construction below has no false negatives) → they become
  *     survivors map-side, touching no exchange;
  *   - keys in the filter (true dups + the fpp fraction) take the
  *     ordinary digest groupBy.
  *
  * The union is therefore EXACTLY `dedup_exact`'s output — a false
  * positive only wastes one shuffled row, never changes a result, and
  * fpp = 1 degrades gracefully to the plain plan.
  *
  * Construction (single pass, associative): per partition keep two
  * filters; each key inserts into `once` unless `once` already claims
  * it, in which case it inserts into `twice`. Merging two states:
  * `twice = t1 ∪ t2 ∪ (o1 ∩ o2)`, `once = o1 ∪ o2`. A key occurring
  * ≥2 times either repeats within a partition (→ some `twice`) or
  * appears in two partitions' `once` sets (→ the intersection, which
  * bitwise-AND over-approximates but never misses). Hence: no false
  * negatives.
  *
  * Memory: the filters are O(corpus distinct keys) BITS on the driver
  * (~1.2 GB per 10⁹ docs at fpp 3%). Past that, raise `fpp` — accuracy
  * is unaffected, only the pruning rate degrades — or build per-shard
  * filters; the knob trades driver memory against shuffle bytes with
  * exactness held constant.
  */
object BloomDedup {

  private def copyOf(b: BloomFilter): BloomFilter = {
    val bos = new ByteArrayOutputStream()
    b.writeTo(bos)
    BloomFilter.readFrom(new ByteArrayInputStream(bos.toByteArray))
  }

  /** Conservative over-approximation of the keys occurring ≥ 2 times
    * in `keys`: membership may be spurious (rate ≈ fpp) but a truly
    * duplicated key is ALWAYS a member.
    */
  def dupCandidateBloom(keys: Dataset[Long], expectedItems: Long,
                        fpp: Double): BloomFilter = {
    val n = math.max(expectedItems, 64L)
    val zero = (BloomFilter.create(n, fpp), BloomFilter.create(n, fpp))
    keys.rdd.treeAggregate(zero)(
      seqOp = { case (st @ (once, twice), k) =>
        if (once.mightContainLong(k)) twice.putLong(k) else once.putLong(k)
        st
      },
      combOp = { case ((o1, t1), (o2, t2)) =>
        // Intersect on a copy: o1 must survive unmutated for the union.
        val inter = copyOf(o1).intersectInPlace(o2)
        t1.mergeInPlace(t2).mergeInPlace(inter)
        (o1.mergeInPlace(o2), t1)
      })._2
  }

  /** Exact dedup with Bloom-routed shuffle pruning: output is
    * row-identical to the plain digest groupBy
    * ([[graft.queries.NorthStar.dedupExact]] — (keep_id, n_copies,
    * text_hash)); only the amount of exchanged data differs.
    *
    * `expectedItems` sizes the filter; pass 0 to count the corpus
    * (one cheap extra job). The routing key is xxhash64 of the text —
    * a 64-bit collision between two DISTINCT texts only forces both
    * into the groupBy lane, where the md5 digest still separates them.
    */
  def dedup(docs: DataFrame, idCol: String, textCol: String,
            fpp: Double = 0.03, expectedItems: Long = 0L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed = docs.select(
      col(idCol),
      xxhash64(coalesce(col(textCol), lit("")).cast("binary")).as("__k"),
      md5(col(textCol).cast("binary")).as("text_hash"))
    val n = if (expectedItems > 0L) expectedItems else docs.count()
    val dupBloom = dupCandidateBloom(keyed.select($"__k").as[Long], n, fpp)
    val isCandidate = graft.functions.BloomContains($"__k", dupBloom)
    val uniques = keyed.filter(!isCandidate)
      .select(col(idCol).as("keep_id"), lit(1L).as("n_copies"), $"text_hash")
    val dups = keyed.filter(isCandidate)
      .groupBy($"text_hash")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select($"keep_id", $"n_copies", $"text_hash")
    uniques.unionByName(dups)
  }
}
