package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BloomContains

/** Runtime Bloom-filter join pruning — the shuffle-reduction pattern for
  * large fact ⋈ selective dim joins.
  *
  * A shuffle join moves EVERY fact row to its key's reducer, even though
  * with a selective dimension most fact rows match nothing and are
  * dropped after the exchange. This operator builds a Bloom filter over
  * the dim side's join keys (a distributed treeAggregate; the sketch is
  * megabytes regardless of dim cardinality), embeds it in the plan, and
  * filters the fact scan BEFORE the exchange — so shuffle volume drops
  * to the matching fraction plus the filter's bounded false-positive
  * rate. The join that follows removes the false positives, making the
  * composition exactly equal to the plain join.
  *
  * This is the manual twin of Spark's row-level runtime filtering
  * (`spark.sql.optimizer.runtimeFilter.bloomFilter.enabled`), exposed as
  * an operator so the pruning applies regardless of optimizer
  * heuristics, works on any key expression, and is plan-assertable. At
  * 100 TB the win is proportional to (1 - selectivity): a fact table
  * whose keys match 2 % of a filtered dim shuffles ~50× less data.
  *
  * Keys are tested as longs (`cast` both sides): Bloom membership is
  * hash-based, so the widening cast preserves exactness for any
  * integral key.
  */
object BloomJoin {

  /** Inner equi-join of `fact` to `dim` with Bloom pre-pruning of the
    * fact side. `expectedItems` sizes the filter (use the dim-side
    * distinct-key estimate; over-sizing costs memory, under-sizing
    * costs false positives, never correctness).
    */
  def prunedEquiJoin(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val keyed = dim.filter(col(dimKey).isNotNull)
      .select(col(dimKey).cast("long").as("__graft_bloom_key"))
    val bloom = keyed.stat.bloomFilter("__graft_bloom_key", expectedItems, fpp)
    val pruned = fact.filter(
      col(factKey).isNotNull && BloomContains(col(factKey).cast("long"), bloom))
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }
}
