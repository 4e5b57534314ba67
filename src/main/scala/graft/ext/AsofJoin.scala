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
  * Skew: a hot key serializes into one partition's sort in
  * [[asofBackward]] — disk-bounded (external sort), but single-threaded
  * wall-clock. [[asofBackwardChunked]] is the skew-safe variant: it
  * salts the shuffle by (key, time-chunk) so a hot key's timeline
  * parallelizes across chunks, then stitches chunk boundaries by
  * carrying each chunk's closing payload forward (result-equality with
  * the plain shape is spec-asserted across chunk widths).
  */
object AsofJoin {

  private def checkArgs(left: DataFrame, payload: Seq[String]): Unit = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    val clash = payload.filter(left.columns.contains)
    require(clash.isEmpty,
      s"payload columns collide with left columns: ${clash.mkString(", ")} — alias the right side")
  }

  def asofBackward(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      payload: Seq[String]): DataFrame = {
    checkArgs(left, payload)
    val lStruct = StructType(left.schema.fields)
    val pStruct = StructType(payload.map(right.schema(_)))

    val lSide = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
      struct(left.columns.map(col): _*).as("__row"),
      lit(null).cast(pStruct).as("__p"))
    // A right row with null key or null time can never satisfy the
    // `l.t >= r.t` bound (ASOF semantics) — filtered here; left with a
    // null time sorts before every right row and keeps null payloads,
    // which already matches.
    val rSide = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
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

  /** Skew-safe as-of: identical semantics to [[asofBackward]], but the
    * sort key is (key, time-chunk) so one hot key fans out over
    * timeline chunks instead of serializing into a single partition's
    * sort. Three bounded stages:
    *
    *  1. within-chunk running `last(payload)` — the plain shape, salted;
    *  2. per (key, chunk): the chunk's CLOSING right payload
    *     (`max_by(payload, time)` over right rows), then a running
    *     `last(ignoreNulls)` over the chunk sequence shifted by one —
    *     "the latest right payload from any EARLIER chunk". This window
    *     is one row per (key, chunk): bounded by timeline/chunk, never
    *     by row count;
    *  3. join the carried payload back on (key, chunk) and
    *     `coalesce(withinChunk, carried)`.
    *
    * Pick `chunk` (e.g. "1 hour", "1 day") so a hot key's rows per
    * chunk fit a task comfortably; a chunk wider than the whole
    * timeline degrades gracefully to exactly [[asofBackward]].
    */
  def asofBackwardChunked(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      payload: Seq[String], chunk: String): DataFrame = {
    checkArgs(left, payload)
    val chunkUs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(chunk))
    require(chunkUs.months == 0,
      s"chunk must be a fixed-length interval (no months/years), got '$chunk'")
    val width = chunkUs.days * 86400000000L + chunkUs.microseconds
    require(width > 0, s"chunk must be positive, got '$chunk'")

    val lStruct = StructType(left.schema.fields)
    val pStruct = StructType(payload.map(right.schema(_)))
    val lSide = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
      struct(left.columns.map(col): _*).as("__row"),
      lit(null).cast(pStruct).as("__p"))
    val rSide = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
        col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
        lit(null).cast(lStruct).as("__row"),
        struct(payload.map(col): _*).as("__p"))
    val u = lSide.unionByName(rSide)
      .withColumn("__c", floor(unix_micros(col("__t")) / width))

    // Stage 1: the plain running-last, salted by chunk.
    val wIn = Window.partitionBy(col("__k"), col("__c"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = u.withColumn("__m", last(col("__p"), ignoreNulls = true).over(wIn))

    // Stage 2: one row per (key, chunk) — closing right payload, then
    // the latest closing payload among STRICTLY EARLIER chunks.
    val closing = u.groupBy(col("__k"), col("__c"))
      .agg(max_by(col("__p"), when(col("__side") === 0, col("__t"))).as("__cp"))
    val wC = Window.partitionBy(col("__k")).orderBy(col("__c").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carried = closing.withColumn(
      "__prev", last(col("__cp"), ignoreNulls = true).over(wC))

    // Stage 3: stitch. Left rows with no within-chunk match fall back
    // to the carried payload from earlier chunks.
    within
      .join(carried.select(col("__k"), col("__c"), col("__prev")), Seq("__k", "__c"))
      .filter(col("__side") === 1)
      .withColumn("__f", coalesce(col("__m"), col("__prev")))
      .select(col("__row.*") +: payload.map(p => col(s"__f.$p").as(p)): _*)
  }
}
