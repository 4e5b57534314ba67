package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Salting must never change results — only the shuffle layout. */
class SkewJoinSpec extends SparkTestBase {
  import spark.implicits._

  // 90% of rows share one hot key.
  private lazy val big = (1 to 2000).map(i =>
    (if (i % 10 == 0) i.toLong % 7 else 1L, i.toDouble)).toDF("k", "v")
  private lazy val dim = Seq((1L, "hot"), (2L, "b"), (3L, "c"), (6L, "d")).toDF("k", "name")

  test("saltedJoin equals the plain join on a skewed key") {
    val plain = big.join(dim, Seq("k")).collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedJoin(big, dim, "k", salts = 8).collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("saltedJoin left-outer keeps unmatched big-side rows") {
    val plain = big.join(dim, Seq("k"), "left").collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedJoin(big, dim, "k", 8, "left").collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("saltedSumCount equals the direct aggregation") {
    val direct = big.groupBy($"k")
      .agg(sum($"v").as("sum_value"), count(lit(1)).as("n_rows"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val salted = SkewJoin.saltedSumCount(big, "k", "v", 8)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(salted.keySet == direct.keySet)
    // double sums may differ in grouping order; compare with tolerance
    direct.foreach { case (k, (s, n)) =>
      val (s2, n2) = salted(k)
      assert(n2 == n && math.abs(s2 - s) < 1e-6)
    }
  }
}
