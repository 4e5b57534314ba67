package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deliberate skew handling (SURVEY §4; brief: "salting for skew").
  *
  * AQE's runtime skew-join split (enabled in every engine session)
  * covers sort-merge joins; these utilities cover the cases AQE cannot
  * re-plan: pre-shuffle salting of a known-skewed key for joins against
  * a modest dimension, and two-phase aggregation when one group key
  * carries a disproportionate share of rows.
  *
  * Cost model: salting multiplies the small side by `salts` (replicate)
  * and splits each hot key's rows across `salts` reducers. Pick salts ≈
  * (hot-key rows) / (target partition rows); 8-32 is typical.
  */
object SkewJoin {

  private def saltCol(salts: Int): Column =
    pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)).cast("int")

  /** Equi-join `big ⨝ small` on `key` with the big side scattered
    * across `salts` buckets and the small side replicated once per
    * bucket — each hot key now occupies `salts` reducers instead of
    * one. Result is identical to the unsalted join (spec-verified).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
      joinType: String = "inner"): DataFrame = {
    val b = big.withColumn("__salt", saltCol(salts))
    val s = small.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase skewed aggregation: partial sum/count per (key, salt),
    * then final combine per key — the map-side-combine pattern made
    * explicit for keys too hot for a single reducer even after partial
    * aggregation (e.g. high-cardinality payloads per group).
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String, salts: Int): DataFrame =
    df.withColumn("__salt", saltCol(salts))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__s"), count(lit(1)).as("__n"))
      .groupBy(col(key))
      .agg(sum(col("__s")).as("sum_value"), sum(col("__n")).as("n_rows"))
}
