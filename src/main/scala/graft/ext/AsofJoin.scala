package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join — for each left row, attach the right row with
  * the greatest right-time ≤ left-time for the same key (the
  * time-series primitive behind "state as of the event": price at
  * trade time, config at request time, last purchase before a click).
  *
  * Spark has no native as-of join; the naive encoding (inequality
  * theta-join + per-left-row max) is a BroadcastNestedLoop disaster at
  * any scale. This is the Spark-first shape: tag both sides, UNION
  * into one stream, hash-shuffle once on the key, sort by (time, side)
  * within partitions, then a running `last(payload, ignoreNulls)`
  * window carries each right payload forward to every later left row.
  * One exchange + one external sort; window state is O(1) per row —
  * the same cost envelope as a windowed aggregate, with no join
  * explosion anywhere.
  *
  * Semantics (pinned by the DuckDB `ASOF LEFT JOIN` oracle, which the
  * CORRECTNESS gate replays): ties on time match (≥, not >) because a
  * right row at time t sorts before a left row at the same t; left
  * rows with no earlier right row keep NULL payloads (left-join
  * shape). The right side must be unique per (key, time) — pre-
  * aggregate it otherwise (an as-of match against duplicate times is
  * undefined in any engine).
  *
  * Skew: a hot key serializes into one partition's sort — the standard
  * fix (chunk the timeline: salt by coarse time bucket, carry the
  * previous chunk's closing payload) composes on top of this operator;
  * at the fixture scales the plain shape is the right default.
  */
object AsofJoin {

  def asofBackward(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    val lStruct = StructType(left.schema.fields)
    val pStruct = StructType(payload.map(right.schema(_)))

    val lSide = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
      struct(left.columns.map(col): _*).as("__row"),
      lit(null).cast(pStruct).as("__p"))
    val rSide = right.select(
      col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
      lit(null).cast(lStruct).as("__row"),
      struct(payload.map(col): _*).as("__p"))

    // Right rows sort before left rows at equal (key, time): equal
    // timestamps match, matching ASOF's >= bound.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__row.*") +: payload.map(p => col(s"__m.$p").as(p)): _*)
  }
}
