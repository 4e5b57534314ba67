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

  /** Distinct hashes with their representative (min member doc_id) —
    * the collapse that makes the band join skew-safe: an identical-hash
    * cluster of m images (ubiquitous at corpus scale — aHash maps every
    * near-uniform image, placeholders/spacers/solid backgrounds, to the
    * all-zero hash) contributes ONE row to the candidate join instead
    * of m.
    */
  private[ext] def hashGroups(members: DataFrame): DataFrame =
    members.groupBy(HashCols.map(col): _*).agg(min(col("doc_id")).as("rep"))

  /** Cross-group candidate pairs (rep_a < rep_b) from band equality at
    * the REPRESENTATIVE level, with oversized band buckets chunk-split
    * into ≤ cap² cells ([[FuzzyJoin.tiledPairs]]) so natural band-value
    * skew can never concentrate a bucket's quadratic work on one task.
    */
  private[ext] def repCandidates(groups: DataFrame, bucketCap: Int): DataFrame = {
    val bands = groups.select(col("rep"),
      posexplode(array(HashCols.map(col): _*)).as(Seq("band", "bval")))
    FuzzyJoin.tiledPairs(
        bands.select(col("rep").as("id"),
          concat_ws(":", col("band"), col("bval")).as("blk")),
        bucketCap)
      .select(col("a.id").as("rep_a"), col("b.id").as("rep_b"))
      .distinct()
  }

  /** Near-duplicate pairs at Hamming ≤ `maxHamming` over a
    * (doc_id, b0..b3) hash frame. Requires maxHamming ≤ 3 so the
    * band-equality candidate join is pigeonhole-complete.
    *
    * Hot-bucket safety (the two corpus-scale skew amplifiers of a
    * naive per-image band join, and their fixes here):
    *  1. Identical hashes collapse to one representative BEFORE
    *     banding ([[hashGroups]]) — the m-member all-zero cluster of
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
    */
  def nearDup(hashes: DataFrame, maxHamming: Int, bucketCap: Int = 4096): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"band-complete threshold is 0..3 over 4 bands: $maxHamming")
    require(bucketCap >= 2, s"bucketCap must be >= 2, got $bucketCap")
    // One materialized exchange on the hash: the group collapse, the
    // hamming-0 tiling and the membership join all consume (b0..b3)
    // partitioning, so the (decode-heavy) upstream hashing runs once
    // (ReuseExchange), not once per branch.
    val members = hashes.select(col("doc_id") +: HashCols.map(col): _*)
      .repartition(HashCols.map(col): _*)
    val groups = hashGroups(members)
    // Hamming-0 lane: all unordered pairs within an identical-hash
    // cluster, tiled so a giant cluster's (true, irreducible) pair
    // output is produced by many ≤ cap² tasks instead of one.
    val within = FuzzyJoin.tiledPairs(
        members.select(col("doc_id").as("id"),
          concat_ws(":", HashCols.map(col): _*).as("blk")),
        bucketCap)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        lit(0L).as("hamming"))
    // Cross-group lane: candidates at rep level, exact Hamming on the
    // 4 ints, THEN expansion to member pairs (distinct groups differ in
    // ≥ 1 bit, so the two lanes are disjoint by construction).
    def hx(side: String, suffix: String) = groups.select(
      col("rep").as(side) +: HashCols.map(c => col(c).as(s"$c$suffix")): _*)
    val hamming = (0 to 3).map(i =>
      bit_count(col(s"b$i" + "_a").bitwiseXOR(col(s"b$i" + "_b"))))
      .reduce(_ + _)
    val repPairs = repCandidates(groups, bucketCap)
      .join(hx("rep_a", "_a"), "rep_a").join(hx("rep_b", "_b"), "rep_b")
      .select(col("rep_a"), col("rep_b"), hamming.cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
    val mem = members.join(groups, HashCols).select(col("rep"), col("doc_id"))
    val cross = repPairs
      .join(mem.select(col("rep").as("rep_a"), col("doc_id").as("ma")), "rep_a")
      .join(mem.select(col("rep").as("rep_b"), col("doc_id").as("mb")), "rep_b")
      .select(least(col("ma"), col("mb")).as("id_a"),
        greatest(col("ma"), col("mb")).as("id_b"), col("hamming"))
    within.unionByName(cross)
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
