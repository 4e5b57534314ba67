package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Perceptual-hash image deduplication — the image-modality answer to
  * MinHash: re-encoded, resized or lightly-edited copies of a picture
  * share no payload bytes (exact dedup is blind to them) but land at
  * tiny Hamming distance under an average-hash of their pixels. The
  * classic aHash recipe: gray the raster, partition into an 8×8 grid,
  * set bit (i,j) when the block's mean gray exceeds the image mean —
  * 64 bits per image regardless of size.
  *
  * Exactness contract (what makes this oracle-checkable): every step
  * is integer arithmetic — gray = r+g+b (no division), block index =
  * (8·x) div W, and the mean comparison is the cross-multiplication
  * `blockSum · totalPx > totalSum · blockPx` (no float mean). The hash
  * is emitted as four 16-bit band values (b0..b3), which avoids 64-bit
  * sign pitfalls AND is already the LSH banding the near-dup join
  * needs.
  *
  * Near-dup completeness: for threshold ≤ 3 differing bits over 4
  * bands, pigeonhole guarantees some band is IDENTICAL, so the
  * band-equality candidate join is provably lossless — the SimHash
  * band argument, applied to images.
  *
  * Scale shape: hashing is map-only (decode + 64 integer sums per
  * image; payloads never shuffle — only (id, 4×int) rows leave the
  * scan). The candidate join is band-keyed over DISTINCT hashes (one
  * representative per identical-hash cluster — see [[nearDup]]), pairs
  * are skinny ids, the exact Hamming check touches 4 ints per pair,
  * and no task exceeds ~cap² comparisons under any key skew.
  */
object ImageHash {

  /** 4 × 16-bit aHash bands from a decoded raster. Bit k = bi·8 + bj
    * (x-block major); band b carries bits [16b, 16b+16).
    */
  def aHashBands(img: java.awt.image.BufferedImage): Array[Int] = {
    val w = img.getWidth
    val h = img.getHeight
    val blockSum = new Array[Long](64)
    val blockPx = new Array[Long](64)
    var totalSum = 0L
    var y = 0
    while (y < h) {
      val bj = (8 * y) / h
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val gray = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        val k = ((8 * x) / w) * 8 + bj
        blockSum(k) += gray
        blockPx(k) += 1
        totalSum += gray
        x += 1
      }
      y += 1
    }
    val totalPx = w.toLong * h
    val bands = new Array[Int](4)
    var k = 0
    while (k < 64) {
      if (blockSum(k) * totalPx > totalSum * blockPx(k))
        bands(k / 16) |= 1 << (k % 16)
      k += 1
    }
    bands
  }

  final case class PHash(doc_id: Long, b0: Int, b1: Int, b2: Int, b3: Int)

  /** Average-hash every (id, payload) row through the REAL codec
    * ([[Multimodal.ImageCodec]]); undecodable payloads drop (the
    * quarantine lane owns them). Map-only.
    */
  def phash(docs: DataFrame, idCol: String, payloadCol: String): DataFrame =
    docs.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          Multimodal.ImageCodec.decodeImage(payload).map { case (_, img) =>
            val b = aHashBands(img)
            PHash(id, b(0), b(1), b(2), b(3))
          }
        }
      }(Encoders.product[PHash]).toDF()

  private val HashCols = Seq("b0", "b1", "b2", "b3")

  /** The 4 × 16-bit bands packed into ONE long (band b at bits
    * [16b, 16b+16)) — the form the folded pair engine
    * ([[FuzzyJoin.hammingPairs]]) consumes: packing is injective, so
    * grouping/joining on the packed value is grouping on the 4 bands,
    * and the bands never overlap, so bit_count(xor) of packed values
    * IS the summed per-band Hamming distance.
    */
  private[ext] def packedHash: org.apache.spark.sql.Column =
    HashCols.zipWithIndex.map { case (c, b) =>
      shiftleft(col(c).cast("long"), 16 * b)
    }.reduce(_ bitwiseOR _)

  /** Band b of a packed hash — the LSH key of [[nearDup]]'s candidate
    * lane, recomputable locally from either side's fingerprint (the
    * first-shared-band dedup relies on that).
    */
  private[ext] def bandAt(fp: org.apache.spark.sql.Column, b: Int): org.apache.spark.sql.Column =
    shiftright(fp, 16 * b).bitwiseAND(lit(0xFFFFL))

  /** Near-duplicate pairs at Hamming ≤ `maxHamming` over a
    * (doc_id, b0..b3) hash frame. Requires maxHamming ≤ 3 so the
    * band-equality candidate join is pigeonhole-complete.
    *
    * Hot-bucket safety (the two corpus-scale skew amplifiers of a
    * naive per-image band join, and their fixes here):
    *  1. Identical hashes collapse to one representative BEFORE
    *     banding (the identical-hash group collapse) — the m-member all-zero cluster of
    *     near-uniform images meets the candidate join once, not m²
    *     times; its true hamming-0 pairs come from a separate
    *     per-task-bounded tiled self-join on the full hash key, and
    *     cross-cluster matches expand arithmetically (members_A ×
    *     members_B) AFTER the Hamming filter, so only true output
    *     pairs are ever materialized from cluster mass.
    *  2. Band buckets above `bucketCap` representatives chunk-split
    *     into id-ordered cells ([[FuzzyJoin.tiledPairs]]), bounding any
    *     single task to ~cap² candidate comparisons regardless of
    *     band-value skew.
    * The emitted pair set is IDENTICAL to the uncollapsed join
    * (`ImageHashSpec` asserts equality vs brute Hamming and bounded
    * candidate volume on a planted 10⁴-image hot bucket).
    *
    * r17: both lanes (the hamming-0 member tiling and the banded rep
    * candidates) fold over ONE chunk window + ONE cell join —
    * [[FuzzyJoin.hammingPairs]] on the packed 64-bit hash; the pair
    * set is unchanged.
    */
  def nearDup(hashes: DataFrame, maxHamming: Int, bucketCap: Int = 4096): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"band-complete threshold is 0..3 over 4 bands: $maxHamming")
    require(bucketCap >= 2, s"bucketCap must be >= 2, got $bucketCap")
    // One materialized exchange on the packed hash: the group collapse,
    // the lane fold and the membership join all consume fp
    // partitioning, so the (decode-heavy) upstream hashing runs once
    // (ReuseExchange), not once per branch.
    val members = hashes
      .select(col("doc_id").as("id"), packedHash.as("fp"))
      .repartition(col("fp"))
    val groups = members.groupBy(col("fp")).agg(min(col("id")).as("rep"))
    FuzzyJoin.hammingPairs(members, groups,
      fp => (0 to 3).map(bandAt(fp, _)), maxHamming, bucketCap)
  }

  /** Pixel-replay CTEs shared by both oracles: `eSql` is the effective
    * generator id as SQL over `documents` (the clone-planting lane),
    * from which width/height/seed and every pixel derive in closed
    * form; block sums and the cross-multiplied threshold reproduce
    * [[aHashBands]] bit for bit.
    */
  private def phashCtes(eSql: String): String =
    s"""ids AS (SELECT doc_id, $eSql AS e FROM documents),
       |dims AS (SELECT doc_id, e, CAST(e % 57 + 8 AS BIGINT) AS w,
       |                 CAST(e % 41 + 8 AS BIGINT) AS h FROM ids),
       |px AS (
       |  SELECT doc_id, w, h, ux.x AS x, uy.y AS y,
       |    (ux.x*31 + uy.y*17 + e) % 256 + (ux.x*7 + uy.y*13 + e // 256) % 256
       |      + (ux.x*3 + uy.y*29 + e // 65536) % 256 AS gray
       |  FROM dims, UNNEST(range(w)) AS ux(x), UNNEST(range(h)) AS uy(y)),
       |blk AS (
       |  SELECT doc_id, (8*x) // w * 8 + (8*y) // h AS k,
       |    sum(gray) AS bsum, count(*) AS bpx,
       |    sum(sum(gray)) OVER (PARTITION BY doc_id) AS tsum,
       |    sum(count(*)) OVER (PARTITION BY doc_id) AS tpx
       |  FROM px GROUP BY doc_id, k),
       |bits AS (
       |  SELECT doc_id, k,
       |    CASE WHEN bsum * tpx > tsum * bpx THEN 1 ELSE 0 END AS bit
       |  FROM blk),
       |hs AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN k // 16 = 0 THEN bit << (k % 16) ELSE 0 END) AS INT) AS b0,
       |    CAST(sum(CASE WHEN k // 16 = 1 THEN bit << (k % 16) ELSE 0 END) AS INT) AS b1,
       |    CAST(sum(CASE WHEN k // 16 = 2 THEN bit << (k % 16) ELSE 0 END) AS INT) AS b2,
       |    CAST(sum(CASE WHEN k // 16 = 3 THEN bit << (k % 16) ELSE 0 END) AS INT) AS b3
       |  FROM bits GROUP BY doc_id)""".stripMargin

  def phashOracleSql(eSql: String): String =
    s"""WITH ${phashCtes(eSql)}
       |SELECT doc_id, b0, b1, b2, b3 FROM hs""".stripMargin

  def nearDupOracleSql(eSql: String, maxHamming: Int): String =
    s"""WITH ${phashCtes(eSql)},
       |bl AS (
       |  SELECT doc_id, u.band AS band,
       |    CASE u.band WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2
       |      ELSE b3 END AS bval
       |  FROM hs, UNNEST(range(4)) AS u(band)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bl a JOIN bl b ON a.band = b.band AND a.bval = b.bval
       |    AND a.doc_id < b.doc_id)
       |SELECT id_a, id_b,
       |  CAST(bit_count(xor(ha.b0, hb.b0)) + bit_count(xor(ha.b1, hb.b1))
       |    + bit_count(xor(ha.b2, hb.b2)) + bit_count(xor(ha.b3, hb.b3))
       |    AS BIGINT) AS hamming
       |FROM cand JOIN hs ha ON ha.doc_id = id_a JOIN hs hb ON hb.doc_id = id_b
       |WHERE bit_count(xor(ha.b0, hb.b0)) + bit_count(xor(ha.b1, hb.b1))
       |    + bit_count(xor(ha.b2, hb.b2)) + bit_count(xor(ha.b3, hb.b3))
       |  <= $maxHamming""".stripMargin
}
