package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Systematic PPS sampling: two-level prefix sum equals the global
  * window, selection is weight-proportional, and heavy items are
  * always taken.
  */
class PpsSampleSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = ((1L to 5000L)
    .map(i => (i, 1L + (i * 7919L) % 200L)) // weights 1..200, deterministic
    :+ (9999L, 5000L)) // one heavy doc spanning multiple steps
    .toDF("id", "w")

  test("two-level start offsets are bit-identical to the global window, any bucket width") {
    val w = Window.orderBy($"id").rowsBetween(Window.unboundedPreceding, -1)
    val global = docs.select($"id", $"w",
      coalesce(sum($"w").over(w), lit(0L)).as("start"))
    for (bw <- Seq(1L, 17L, 64L, 100000L)) {
      val two = SeqPack.startOffsets(docs, "id", "w", bw)
      assert(two.exceptAll(global).isEmpty && global.exceptAll(two).isEmpty,
        s"bucketWidth=$bw diverged from the global window")
    }
  }

  test("sample size tracks total weight / step; heavy docs always selected") {
    val step = 1000L
    val total = docs.agg(sum($"w")).head().getLong(0)
    val got = SeqPack.ppsSample(docs, "id", "w", step, bucketWidth = 64L)
    val n = got.count()
    val expect = total.toDouble / step
    assert(math.abs(n - expect) <= expect * 0.02 + 2,
      s"sample size $n far from E=$expect")
    // A document with w >= step covers a multiple of step always.
    val heavy = docs.filter($"w" >= step)
    assert(heavy.join(got, "id").count() == heavy.count())
  }

  test("pick_idx is strictly increasing over id order (systematic walk)") {
    val got = SeqPack.ppsSample(docs, "id", "w", 1000L, 64L)
      .orderBy($"id").select($"pick_idx").collect().map(_.getLong(0)).toSeq
    assert(got == got.sorted && got.distinct.size == got.size)
  }
}
