package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Perceptual image hashing + band-complete Hamming near-dup. */
class ImageHashSpec extends SparkTestBase {
  import spark.implicits._

  private def png(w: Int, h: Int, seed: Long): Array[Byte] =
    Multimodal.ImageCodec.encodePng(w, h, seed)

  test("identical pictures in different byte streams hash identically;" +
    " different pictures do not") {
    val base = png(20, 12, 7L)
    // Same picture, genuinely different byte stream: a spliced tEXt
    // chunk changes the bytes without touching a pixel — the stream
    // exact byte-level dedup cannot pair with the original.
    val reencoded = Multimodal.ImageCodec.annotatePng(base, "re-encoded copy")
    assert(!java.util.Arrays.equals(base, reencoded))
    val docs = Seq(
      (1L, base),
      (2L, reencoded),
      (3L, png(20, 12, 999L))) // different pattern
      .toDF("doc_id", "payload")
    val h = ImageHash.phash(docs, "doc_id", "payload").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))))
      .toMap
    assert(h(1L) === h(2L))
    assert(h(1L) !== h(3L))
  }

  test("aHashBands matches a direct pixel-formula computation") {
    // Recompute the hash from the generator arithmetic without any
    // codec: proves decode recovered exact bytes AND the block/bit
    // rules agree with the oracle's closed form.
    val (w, h, seed) = (23, 11, 42L)
    val img = Multimodal.ImageCodec.decodeImage(png(w, h, seed)).get._2
    val got = ImageHash.aHashBands(img).toSeq
    val blockSum = new Array[Long](64)
    val blockPx = new Array[Long](64)
    var total = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val gray = ((x * 31 + y * 17 + seed) % 256 +
        (x * 7 + y * 13 + (seed >> 8)) % 256 +
        (x * 3 + y * 29 + (seed >> 16)) % 256).toInt
      val k = (8 * x / w) * 8 + (8 * y / h)
      blockSum(k) += gray; blockPx(k) += 1; total += gray
    }
    val want = new Array[Int](4)
    for (k <- 0 until 64)
      if (blockSum(k) * w * h > total * blockPx(k)) want(k / 16) |= 1 << (k % 16)
    assert(got === want.toSeq)
  }

  test("banded near-dup at <= 3 is pigeonhole-complete vs brute force") {
    // Mirrors the query fixture: clones render with the successor's
    // generator id AND re-encode through annotatePng, so every planted
    // pair is byte-different.
    val docs = (0L until 40L).map { id =>
      val e = if (id % 13 == 0) id + 1 else id
      val p = png((e % 57 + 8).toInt, (e % 41 + 8).toInt, e)
      (id, if (id % 13 == 0) Multimodal.ImageCodec.annotatePng(p, s"c$e") else p)
    }.toDF("doc_id", "payload")
    val hashes = ImageHash.phash(docs, "doc_id", "payload").cache()
    val banded = ImageHash.nearDup(hashes, 3)
      .select("id_a", "id_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // Brute force: all pairs, exact hamming.
    val rows = hashes.collect()
      .map(r => r.getLong(0) -> Seq(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    val brute = (for {
      (a, ha) <- rows; (b, hb) <- rows if a < b
      d = ha.zip(hb).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
      if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(banded === brute)
    // The planted clone pairs are all found at hamming 0.
    val clones = (0L until 40L)
      .filter(id => id % 13 == 0 && id + 1 < 40 && (id + 1) % 13 != 0)
      .map(id => (id, id + 1, 0L)).toSet
    assert(clones.nonEmpty)
    assert(clones.subsetOf(banded))
    hashes.unpersist()
  }

  private def uniformPng(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val rgb = (gray << 16) | (gray << 8) | gray
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("planted 10^4-image hot bucket: candidate volume stays bounded" +
    " and output matches brute Hamming, computed arithmetically") {
    // The corpus-scale skew case the band join must survive: every
    // near-uniform image (placeholders, spacers, solid backgrounds)
    // hashes to all-zero — one bucket holds them all. 10^4 of them
    // (byte-different: varying dims and grays) plus 50 varied patterns.
    val m = 10000
    val uniform = (0L until m.toLong).map { id =>
      (id, uniformPng((id % 23 + 6).toInt, (id % 17 + 6).toInt, (id % 200 + 10).toInt))
    }
    val varied = (0L until 50L).map { i =>
      (m + i, png((i % 57 + 8).toInt, (i % 41 + 8).toInt, i * 7 + 1))
    }
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(uniform ++ varied, 16))
      .toDF("doc_id", "payload")
    val hashes = ImageHash.phash(docs, "doc_id", "payload").cache()
    val hs = hashes.collect()
      .map(r => r.getLong(0) -> Seq(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toMap
    assert(hs.size === m + 50)
    // Every uniform image lands in the all-zero bucket.
    (0L until m.toLong).foreach(id => assert(hs(id) === Seq(0, 0, 0, 0)))

    // Candidate volume: the rep-level band join sees one row per
    // DISTINCT hash, so candidates are bounded by distinct-hash pairs
    // (<= C(51, 2) here) — a per-image band join would have generated
    // >= C(10^4, 2) ~ 5*10^7 candidate rows from this one bucket.
    val members = hashes.select(col("doc_id").as("id"), ImageHash.packedHash.as("fp"))
    val groups = members.groupBy(col("fp")).agg(min(col("id")).as("rep"))
    val nGroups = groups.count()
    assert(nGroups <= 51)
    val candRows = graft.ext.FuzzyJoin.hammingLanePairs(members, groups,
        fp => (0 to 3).map(ImageHash.bandAt(fp, _)), 3, 4096)
      .filter(col("band") >= 0).count()
    assert(candRows <= nGroups * (nGroups - 1) / 2)

    // Brute ground truth, computed arithmetically over distinct hashes:
    // pairs within a hash group are all hamming 0; cross-group pair
    // counts multiply group sizes when the group-hash hamming <= 3.
    val bySig = hs.toSeq.groupBy(_._2).map { case (sig, xs) => sig -> xs.size.toLong }
    val sigs = bySig.keys.toSeq
    val expectWithin = bySig.values.map(n => n * (n - 1) / 2).sum
    def ham(a: Seq[Int], b: Seq[Int]) =
      a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    val expectCross = (for {
      i <- sigs.indices; j <- (i + 1) until sigs.size
      if ham(sigs(i), sigs(j)) <= 3
    } yield bySig(sigs(i)) * bySig(sigs(j))).sum
    assert(expectWithin >= m.toLong * (m - 1) / 2) // the hot bucket is real

    val out = ImageHash.nearDup(hashes, 3).cache()
    val gotByHam = out.groupBy("hamming").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotByHam.getOrElse(0L, 0L) === expectWithin)
    assert(gotByHam.filter(_._1 > 0L).values.sum === expectCross)
    assert(out.count() === expectWithin + expectCross)
    // No duplicate pairs, and ordering holds.
    assert(out.filter(col("id_a") >= col("id_b")).count() === 0L)
    assert(out.select("id_a", "id_b").distinct().count() === expectWithin + expectCross)
    out.unpersist(); hashes.unpersist()
  }

  test("undecodable payloads drop to the quarantine lane, not the hash") {
    val docs = Seq((1L, png(10, 10, 1L)), (2L, Array[Byte](1, 2, 3)))
      .toDF("doc_id", "payload")
    val out = ImageHash.phash(docs, "doc_id", "payload")
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(1L))
  }
}
