package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Invariants of the SRP reduction the oracle hash can't explain on
  * its own: sign-matrix determinism and balance, exact-integer
  * components against an in-driver replay, and the quality contract —
  * reduced-space cosine must correlate with full-space cosine (that's
  * the entire point of the operator; a hash-exact but useless
  * projection would still pass the gate).
  */
class RandomProjectionSpec extends SparkTestBase {
  import spark.implicits._

  test("sign matrix is deterministic and roughly balanced") {
    val m1 = RandomProjection.signMatrix(64, 16)
    val m2 = RandomProjection.signMatrix(64, 16)
    assert(m1 === m2)
    assert(m1.flatten.forall(s => s == 1 || s == -1))
    // md5 parity over 1024 cells: expect ~512 ± a generous band.
    val plus = m1.flatten.count(_ == 1)
    assert(plus > 400 && plus < 624, s"sign balance off: +$plus/1024")
  }

  test("components equal an in-driver integer replay") {
    val vecs = Seq(
      (0L, Array(1.0f, -2.0f, 3.0f, -4.0f)),
      (1L, Array(0.5f, 0.25f, -0.125f, 1.0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = RandomProjection.reduce(df, 4, 3)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    val m = RandomProjection.signMatrix(4, 3)
    for ((id, v) <- vecs) {
      val scale = v.map(x => math.abs(x.toDouble)).max / 127.0
      val q = v.map(x => math.floor(x / scale + 0.5).toLong)
      for (j <- 0 until 3) {
        val expect = (0 until 4).map(i => m(j)(i) * q(i)).sum
        assert(got((id, j)) === expect, s"vec $id dim $j")
      }
    }
  }

  test("reduced cosines track full cosines (the JL contract)") {
    // The fixture's embeddings are near-isotropic noise: full-space
    // top-1 margins are ~0.02, so exact-argmax agreement at 16/64 dims
    // is NOT the preserved quantity (measured 2/50) — pairwise-cosine
    // CORRELATION is. Measured: r ≈ 0.46 for the md5-parity matrix vs
    // 0.08 for a degenerate all-ones matrix (which would still be
    // hash-exact) — the 0.3 floor separates the two regimes cleanly.
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .orderBy("vec_id").limit(200)
    val full = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val red = RandomProjection.reduce(emb, 64, 16)
      .collect().groupBy(_.getLong(0)).map { case (id, rs) =>
        id -> rs.sortBy(_.getInt(1)).map(_.getLong(2).toDouble)
      }
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val ids = full.keys.toSeq.sorted
    val pairs = for {
      i <- ids.indices; j <- (i + 1) until ids.size
    } yield (cosine(full(ids(i)), full(ids(j))),
      cosine(red(ids(i)), red(ids(j))))
    val (xs, ys) = (pairs.map(_._1), pairs.map(_._2))
    val (mx, my) = (xs.sum / xs.size, ys.sum / ys.size)
    val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val r = cov / math.sqrt(
      xs.map(x => (x - mx) * (x - mx)).sum *
        ys.map(y => (y - my) * (y - my)).sum)
    assert(r > 0.3, s"full/reduced cosine correlation too low: $r")
  }
}
