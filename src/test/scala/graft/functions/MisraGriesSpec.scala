package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.Tables.t
import graft.functions.MisraGriesAgg.misraGries

/** Misra-Gries aggregate: the frequency guarantee
  * (true − N/(k+1) ≤ est ≤ true, every item over N/(k+1) present)
  * must hold under Spark's real partial-agg + merge path — every test
  * runs over a multi-partition frame so serialize/merge/deserialize
  * are genuinely exercised.
  */
class MisraGriesSpec extends SparkTestBase {

  private def sketchOf(df: org.apache.spark.sql.DataFrame, colName: String,
      k: Int): Map[String, Long] =
    df.agg(misraGries(col(colName), k).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def exactOf(df: org.apache.spark.sql.DataFrame, colName: String): Map[String, Long] =
    df.groupBy(col(colName)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("estimates bounded: true - N/(k+1) <= est <= true, on a skewed stream") {
    val s = spark; import s.implicits._
    // Zipf-ish: item i appears ~30000/i times; small k forces heavy
    // decrement/merge activity.
    val rows = (1 to 200).flatMap(i => Seq.fill(30000 / i)(s"item$i"))
    val df = rows.toDF("tok").repartition(16)
    val k = 20
    val n = rows.size.toLong
    val est = sketchOf(df, "tok", k)
    val exact = exactOf(df, "tok")
    assert(est.nonEmpty && est.size <= k)
    est.foreach { case (item, e) =>
      val t = exact(item)
      assert(e <= t, s"$item overestimated: $e > $t")
      assert(e >= t - n / (k + 1), s"$item undershot the bound: $e < $t - ${n / (k + 1)}")
    }
  }

  test("every item with true count > N/(k+1) is present in the merged sketch") {
    val s = spark; import s.implicits._
    val rows = (1 to 500).flatMap(i => Seq.fill(if (i <= 5) 5000 else 10)(s"w$i"))
    val df = rows.toDF("tok").repartition(32) // force many partial merges
    val k = 10
    val n = rows.size.toLong
    val est = sketchOf(df, "tok", k)
    val exact = exactOf(df, "tok")
    val mustHave = exact.filter { case (_, c) => c > n / (k + 1) }.keySet
    assert(mustHave.nonEmpty)
    assert(mustHave.subsetOf(est.keySet),
      s"missing guaranteed heavy hitters: ${mustHave -- est.keySet}")
  }

  test("sketch-then-verify heavy_hitters equals the exact >=1% query") {
    val s = spark; import s.implicits._
    val got = graft.queries.NorthStar.heavyHitters(s, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val toks = t(s, sf0001, "documents")
      .select(explode(split(trim($"text"), "\\s+")).as("token"))
      .filter(length($"token") > 0)
    val n = toks.count()
    val want = toks.groupBy($"token").agg(count(lit(1)).as("n"))
      .filter($"n" >= math.ceil(n / 100.0))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(want.nonEmpty, "fixture should have >=1% tokens")
  }

  test("the guarantee survives a watermarked streaming window aggregate") {
    // The UDAF is mergeable, so it runs unchanged inside a streaming
    // window aggregate where Spark merges PARTIAL sketches across
    // microbatches and shuffle partitions in nondeterministic order.
    // The MG guarantee — every value with true share >= 1/(k+1) is
    // present — must hold per emitted window regardless of that order.
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.stream.Ev
    val s = spark; import s.implicits._
    def day(d: Int, m: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-0$d 10:$m%02d:00")
    // Per day: one hot value (60 of 100 events) + a 40-value tail.
    def events(d: Int): Seq[Ev] =
      (0 until 60).map(i => Ev(d * 1000 + i, 1, day(d, i % 50), "hot", 0.0)) ++
        (0 until 40).map(i => Ev(d * 1000 + 100 + i, 1, day(d, i), s"t$i", 0.0))
    val all = events(1) ++ events(2)
    val ms = MemoryStream[Ev](org.apache.spark.sql.Encoders.product[Ev], s.sqlContext)
    val q = ms.toDF().withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 day").as("w"))
      .agg(misraGries($"event_type", 59).as("sk"), count(lit(1)).as("n"))
      .select($"w.start".as("ws"), $"sk", $"n")
      .writeStream.format("memory").queryName("mg_window")
      .outputMode("append").start()
    try {
      // Shuffled thirds across three microbatches: real partial merges.
      val shuffled = new scala.util.Random(7).shuffle(all)
      shuffled.grouped(70).foreach { b => ms.addData(b: _*); q.processAllAvailable() }
      ms.addData(Ev(9999, 9, Timestamp.valueOf("2024-01-05 00:00:00"), "tick", 0.0))
      q.processAllAvailable()
      val rows = s.table("mg_window").collect()
        .filter(_.getTimestamp(0).toString.startsWith("2024-01-0"))
        .map(r => r.getTimestamp(0).toString.take(10) ->
          r.getSeq[org.apache.spark.sql.Row](1).map(_.getString(0)).toSet)
        .toMap
      assert(rows.keySet == Set("2024-01-01", "2024-01-02"))
      // 'hot' is 60% >> 1/60: guaranteed present in both windows.
      assert(rows.values.forall(_.contains("hot")),
        s"MG guarantee violated under streaming merges: $rows")
    } finally q.stop()
  }

  test("nulls carry no mass and groupBy works per group") {
    val s = spark; import s.implicits._
    val df = Seq(("a", Some("x")), ("a", Some("x")), ("a", None), ("a", Some("y")),
      ("b", Some("z"))).toDF("g", "tok").repartition(4)
    val bySketch = df.groupBy($"g").agg(misraGries($"tok", 5).as("sk"))
      .select($"g", explode($"sk").as("e")).select($"g", $"e.item", $"e.est")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(bySketch == Set(("a", "x", 2L), ("a", "y", 1L), ("b", "z", 1L)))
  }
}
