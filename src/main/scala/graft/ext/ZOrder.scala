package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of two
  * bucketized dimensions into one sort key so that range-partitioned,
  * sorted files carry TIGHT min/max bounds on BOTH dimensions — parquet
  * footer pruning (and any min/max-indexed store) can then skip files
  * for predicates on either column, where a linear sort prunes on the
  * leading column only. This is the layout half of the bucketing story
  * ([[graft.sink.BucketedLayout]] co-locates joins; Z-order co-locates
  * range predicates): pay one clustered write, every later selective
  * scan reads a fraction of the files.
  *
  * Scale: `zValue` is pure bit algebra inside whole-stage codegen;
  * the write is one range exchange on the z key (sampled bounds), the
  * same shuffle a plain global sort would pay.
  */
object ZOrder {

  /** Morton interleave of two non-negative ints bucketized to `bits`
    * each (bit i of x → bit 2i, bit i of y → bit 2i+1). Callers map
    * raw values into [0, 2^bits) first — modulo for ids, fixed-width
    * quantiles for continuous values.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftrightunsigned(x.cast("long"), i).bitwiseAND(1L), 2 * i))
        .bitwiseOR(shiftleft(shiftrightunsigned(y.cast("long"), i).bitwiseAND(1L), 2 * i + 1))
    }
  }

  /** Smallest `bits` such that both columns' observed maxima fit in
    * [0, 2^bits) — one aggregate over the frame, paid once at layout
    * time. Passing raw ids with a guessed width silently drops high
    * bits in [[zValue]] (keys 2^bits apart collide on the z key),
    * which degrades pruning without affecting correctness; deriving
    * the width removes the guess.
    */
  def deriveBits(df: DataFrame, xCol: String, yCol: String): Int = {
    val row = df.agg(max(col(xCol).cast("long")), max(col(yCol).cast("long"))).head()
    val m = math.max(if (row.isNullAt(0)) 0L else row.getLong(0),
      if (row.isNullAt(1)) 0L else row.getLong(1))
    require(m >= 0, s"z-order dimensions must be non-negative, max=$m")
    math.min(31, math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(m)))
  }

  /** Write `df` z-ordered on two bucketized dimension columns:
    * range-partition by the z key into `numFiles` sorted files. The z
    * key is dropped from the stored schema — it's a layout artifact,
    * not data (dropping after the sort re-projects but keeps the
    * within-partition order).
    */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
      bits: Int, numFiles: Int): Unit =
    df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
