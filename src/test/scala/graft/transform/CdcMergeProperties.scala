package graft.transform

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Property check: the distributed CDC merge agrees with a sequential
  * in-memory reference fold on arbitrary feeds — random key overlap,
  * op mixes, stacked changes per key, and shuffled feed order (the
  * merge must not depend on input row order, only on sequence numbers).
  */
class CdcMergeProperties extends SparkTestBase {

  private def forAllSeeded[A](gen: Gen[A], n: Int = 25)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(1337L + i)))
    }

  private case class C(k: Long, bal: Double, op: String, seq: Long)

  /** Sequential truth: newest change per key wins; D removes, else
    * upsert; untouched base keys pass through.
    */
  private def reference(base: Map[Long, Double], feed: Seq[C]): Map[Long, Double] = {
    val latest = feed.groupBy(_.k).map { case (k, cs) => k -> cs.maxBy(_.seq) }
    val kept = base.filter { case (k, _) => !latest.contains(k) }
    kept ++ latest.collect { case (k, c) if c.op != "D" => k -> c.bal }
  }

  private val feedGen: Gen[(Map[Long, Double], Seq[C])] = for {
    baseKeys <- Gen.someOf(0L to 19L)
    nChanges <- Gen.choose(0, 30)
    ks <- Gen.listOfN(nChanges, Gen.choose(0L, 24L)) // overlaps + inserts
    ops <- Gen.listOfN(nChanges, Gen.frequency(3 -> "U", 1 -> "D", 1 -> "I"))
    shuffleSeed <- Gen.choose(0L, Long.MaxValue)
  } yield {
    val base = baseKeys.map(k => k -> k * 1.5).toMap
    // Unique seq per key: position in the feed is the log offset.
    val feed = ks.zip(ops).zipWithIndex.map { case ((k, op), i) =>
      C(k, k * 10.0 + i, op, i.toLong)
    }
    (base, new scala.util.Random(shuffleSeed).shuffle(feed))
  }

  test("merge equals the sequential reference fold on arbitrary feeds") {
    val s = spark
    import s.implicits._
    forAllSeeded(feedGen) { case (base, feed) =>
      val baseDf = base.toSeq.map { case (k, b) => (k, b) }.toDF("k", "bal")
      val expect = reference(base, feed)
      val got =
        if (feed.isEmpty) baseDf.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        else CdcMerge.applyChanges(
            baseDf, feed.map(c => (c.k, c.bal, c.op, c.seq)).toDF("k", "bal", "op", "seq"), "k")
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got == expect, s"base=$base feed=$feed")
    }
  }
}
