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
    val docs = Seq(
      (1L, png(20, 12, 7L)),
      (2L, png(20, 12, 7L)),   // same picture, independently encoded
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
    val docs = (0L until 40L).map { id =>
      val e = if (id % 13 == 0) id + 1 else id
      (id, png((e % 57 + 8).toInt, (e % 41 + 8).toInt, e))
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

  test("undecodable payloads drop to the quarantine lane, not the hash") {
    val docs = Seq((1L, png(10, 10, 1L)), (2L, Array[Byte](1, 2, 3)))
      .toDF("doc_id", "payload")
    val out = ImageHash.phash(docs, "doc_id", "payload")
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(1L))
  }
}
