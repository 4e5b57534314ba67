package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sharding: assign each document to a fixed-token-budget
  * training shard by its START OFFSET in the corpus-wide running token
  * total over a deterministic document order — the step that turns a
  * cleaned corpus into evenly-sized sequence-packing work units
  * (shard k holds the docs whose token stream begins in
  * [k·budget, (k+1)·budget)).
  *
  * A global running sum is the textbook anti-pattern at 100 TB — a
  * window over ONE ordering is a single-partition sort. This is the
  * classic two-level parallel prefix sum instead:
  *
  *  1. docs bucket by a monotone function of the order key
  *     (floor(id / bucketWidth)), so bucket order == document order;
  *  2. an in-bucket running sum (window partitioned BY BUCKET — fully
  *     parallel, each bucket sorts locally);
  *  3. per-bucket totals (tiny aggregate: one row per bucket) get an
  *     EXCLUSIVE running sum over bucket order — the only
  *     single-partition window, over #buckets rows, not the corpus;
  *  4. bucket offsets broadcast back; each doc's global start offset
  *     is bucket_offset + in_bucket_running − own_count.
  *
  * The result is bit-identical to the global window for ANY
  * bucketWidth (spec-asserted), so the width is purely a parallelism
  * knob: pick it so each bucket holds a few partitions' worth of rows.
  */
object SeqPack {

  /** Shard assignment over a precomputed token-count column.
    * `idCol` must be non-negative and unique (the deterministic order
    * key); ties are impossible, so the running sum is total-ordered.
    */
  def tokenShards(docs: DataFrame, idCol: String, tokCol: String,
      budget: Long, bucketWidth: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val bucketed = docs.withColumn("__bucket",
      floor(col(idCol) / bucketWidth).cast("long"))
    val wIn = Window.partitionBy(col("__bucket")).orderBy(col(idCol))
    val inBucket = bucketed.withColumn("__run",
      sum(col(tokCol).cast("long")).over(wIn))
    val wOff = Window.orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("__bucket"))
      .agg(sum(col(tokCol).cast("long")).as("__tot"))
      .withColumn("__off", coalesce(sum(col("__tot")).over(wOff), lit(0L)))
      .select(col("__bucket"), col("__off"))
    inBucket.join(broadcast(offsets), "__bucket")
      .withColumn("__start", col("__off") + col("__run") - col(tokCol).cast("long"))
      .select(col(idCol), col(tokCol).cast("long").as(tokCol),
        // Integral divide (start offsets are non-negative): a double
        // division loses exactness once offsets pass 2^53 — inside the
        // design's corpus ambition; `div` stays exact over the full
        // long range (SeqPackSpec proves the divergence).
        expr(s"__start div ${budget}L").as("shard_id"))
  }

  /** Reference single-window encoding (the shape the two-level version
    * must reproduce bit-for-bit) — test/oracle use only: one global
    * sort, fine at fixture scale, wrong at corpus scale.
    */
  def tokenShardsGlobal(docs: DataFrame, idCol: String, tokCol: String,
      budget: Long): DataFrame = {
    val w = Window.orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("__run", sum(col(tokCol).cast("long")).over(w))
      .withColumn("__start", col("__run") - col(tokCol).cast("long"))
      .select(col(idCol), col(tokCol).cast("long").as(tokCol),
        expr(s"__start div ${budget}L").as("shard_id"))
  }
}
