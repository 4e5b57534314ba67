package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM tokenization (the SentencePiece unigram model, Kudo
  * 2018) with INTEGER-EXACT code-length costs, so both training and
  * application are oracle-replayable where the reference
  * implementation's float log-probs are not:
  *
  *  - the candidate inventory is every substring of length 1..4 of the
  *    corpus's distinct words, weighted by word frequency, CAPPED at
  *    the [[MaxVocab]] highest-mass multi-character pieces (ties by
  *    piece, the byte order both engines share); single characters are
  *    ALWAYS retained outside the cap, so every word stays segmentable
  *    and the cap can never orphan a word. The cap is what makes the
  *    driver-side cost broadcast safe at any corpus size: a seed
  *    vocabulary is a fixed-size model artifact (SentencePiece's own
  *    --vocab_size), not a corpus-proportional set;
  *  - a piece's cost is its code length in whole bits under the
  *    inventory's own frequency distribution — bitlen(total_mass) −
  *    bitlen(count) + 1 — the same integer stand-in for −log2 P the
  *    CCNet bucketing uses (bit-length is exact in both engines;
  *    the +1 keeps every cost ≥ 1, so min-cost segmentations also
  *    prefer fewer pieces among equal-bit alternatives);
  *  - a word's segmentation is the min-total-cost split (Viterbi);
  *    ties break by the lexicographically-smallest piece path, making
  *    the argmin total — both sides compare ASCII strings bytewise;
  *  - hard-EM refit: pieces are re-counted from the Viterbi
  *    segmentations (count × uses) — the E-step of hard EM; production
  *    loops exactly this exchange (and prunes the tail) until the
  *    inventory stabilizes, so one oracle-gated round IS the training
  *    step, the BPE-merges pattern.
  *
  * Scale shape: everything is VOCABULARY-bounded, and the inventory is
  * additionally CAP-bounded. Distinct words come from one
  * map-side-combined aggregate (the corpus's only full pass); the
  * inventory is a substring explode of that word table reduced to the
  * top-[[MaxVocab]] multi-char pieces via orderBy+limit — Spark plans
  * that as TakeOrderedAndProject (per-partition partial top-K, K rows
  * to the driver), so the collect at [[segmentWords]] moves
  * O(MaxVocab + alphabet) rows regardless of corpus size; Viterbi runs
  * per DISTINCT word (a mapPartitions DP — justified like the media
  * codecs: a dynamic program over string positions has no Catalyst
  * expression form) with the piece-cost table broadcast; the corpus
  * token stream then applies segmentations through a broadcast word →
  * pieces join exactly like the trained-BPE apply (the token stream
  * never shuffles).
  *
  * Unicode contract: the DP walks CODEPOINTS (so a 4-codepoint piece
  * of supplementary-plane characters is reachable even though it is 8
  * UTF-16 units), path ties compare UTF-8 BYTES (the binary collation
  * Spark's UTF8String and DuckDB's memcmp both use), and words longer
  * than [[MaxWordLen]] codepoints are excluded on BOTH sides — the
  * standard tokenizer-training guard against unbroken URL/base64 runs,
  * which also bounds the oracle's recursive split enumeration.
  */
object UnigramLm {

  val MaxPieceLen = 4

  /** Cap on multi-character inventory pieces (single chars always kept).
    * 128 binds at every fixture scale (the documents vocabulary holds
    * 204 multi-char candidates), so the gate proves both engines agree
    * on the capped selection, not just on an uncapped universe.
    */
  val MaxVocab = 128

  /** Max word length in codepoints; longer tokens (URLs, base64) are
    * dropped from training AND application, mirrored in the oracle.
    */
  val MaxWordLen = 24

  private[ext] def words(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(trim(coalesce(col(textCol), lit(""))), "\\s+"))
        .as("word"))
      .filter(length(col("word")) > 0 && length(col("word")) <= MaxWordLen &&
        !col("word").contains("|"))
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))

  /** Every (piece, summed word-frequency) for substrings of length
    * 1..MaxPieceLen, weighted per occurrence position. The nested
    * lambda (position × length) is written in SQL text because
    * `substring(word, i, l)` needs BOTH lambda variables as arguments.
    */
  private[ext] def piecesOf(w: DataFrame): DataFrame =
    w.select(col("word"), col("wc"))
      .withColumn("__p", explode(expr(
        s"""flatten(transform(sequence(1, length(word)),
           |  i -> transform(sequence(1, least($MaxPieceLen, length(word) - i + 1)),
           |    l -> substring(word, i, l))))""".stripMargin)))
      .groupBy(col("__p").as("piece"))
      .agg(sum(col("wc")).as("cnt"))

  /** The real inventory: (piece, cnt, cost) — single characters plus
    * the top-[[MaxVocab]] multi-char pieces by (mass desc, piece asc).
    * The orderBy+limit plans as TakeOrderedAndProject (distributed
    * partial top-K), and the code-length costs are computed over the
    * KEPT inventory's own mass, so the capped model is self-consistent
    * (the pruned tail carries no probability), exactly as a pruned
    * SentencePiece model renormalizes.
    */
  def pieceInventory(docs: DataFrame, textCol: String): DataFrame = {
    val p = piecesOf(words(docs, textCol))
    val singles = p.filter(length(col("piece")) === 1)
    val multi = p.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece").asc)
      .limit(MaxVocab)
    val kept = singles.unionByName(multi)
    val total = kept.agg(sum(col("cnt")).as("__total"))
    kept.crossJoin(broadcast(total))
      .select(col("piece"), col("cnt").cast("long").as("cnt"),
        (length(bin(col("__total"))) - length(bin(col("cnt"))) + 1)
          .cast("long").as("cost"))
  }

  /** Min-cost segmentation per distinct corpus word:
    * (word, wc, enc, n_pieces, total_cost) with enc the '|'-joined
    * piece path. Deterministic: cost, then lexicographic path.
    */
  def segmentWords(docs: DataFrame, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    val inv = pieceInventory(docs, textCol)
      .select(col("piece"), col("cost")).collect()
    val costs: Map[String, Long] =
      inv.map(r => r.getString(0) -> r.getLong(1)).toMap
    val bc = spark.sparkContext.broadcast(costs)
    val w = words(docs, textCol)
    import spark.implicits._
    val seg = w.select(col("word"), col("wc")).as[(String, Long)]
      .mapPartitions { it =>
        val c = bc.value
        it.map { case (word, wc) =>
          val (cost, path) = viterbi(word, c)
          (word, wc, path, path.count(_ == '|') + 1L, cost)
        }
      }
      .toDF("word", "wc", "enc", "n_pieces", "total_cost")
    seg
  }

  /** Unsigned bytewise UTF-8 comparison — the binary collation Spark's
    * UTF8String and DuckDB's memcmp both apply to string ORDER BY, so
    * JVM-side tie-breaks match the oracle's even off the BMP (Java's
    * String.compareTo orders by UTF-16 units, which disagrees with
    * UTF-8 byte order: a supplementary-plane character ranks BELOW
    * BMP characters ≥ U+E000 in UTF-16 units, the inverse of its
    * UTF-8 bytes).
    */
  private[ext] def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val m = math.min(x.length, y.length)
    var i = 0
    while (i < m) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** Integer Viterbi over CODEPOINTS: min total cost over splits into
    * pieces of 1..MaxPieceLen codepoints present in `costs`; ties by
    * UTF-8-bytewise-smallest path ([[utf8Less]]), matching the
    * oracle's ORDER BY cost, path. Single characters are always in the
    * inventory (kept outside the cap), so every word reaches the final
    * state.
    */
  private[ext] def viterbi(word: String, costs: Map[String, Long]): (Long, String) = {
    val cps = word.codePoints.toArray
    val n = cps.length
    val bestCost = Array.fill(n + 1)(Long.MaxValue)
    val bestPath = new Array[String](n + 1)
    bestCost(0) = 0L
    bestPath(0) = ""
    var j = 1
    while (j <= n) {
      var l = 1
      while (l <= math.min(MaxPieceLen, j)) {
        val i = j - l
        if (bestPath(i) != null) {
          val piece = new String(cps, i, l)
          costs.get(piece).foreach { c =>
            val cand = bestCost(i) + c
            val candPath =
              if (bestPath(i).isEmpty) piece else bestPath(i) + "|" + piece
            if (cand < bestCost(j) ||
                (cand == bestCost(j) && utf8Less(candPath, bestPath(j)))) {
              bestCost(j) = cand
              bestPath(j) = candPath
            }
          }
        }
        l += 1
      }
      j += 1
    }
    (bestCost(n), bestPath(n))
  }

  /** Trained-tokenizer corpus application: per-document word / piece /
    * bit totals through a broadcast word → segmentation join (the
    * bpeTokenize serving shape).
    */
  def tokenize(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val seg = segmentWords(docs, textCol)
      .select(col("word"), col("n_pieces"), col("total_cost"))
    docs.select(col(idCol),
        explode(split(trim(coalesce(col(textCol), lit(""))), "\\s+")).as("word"))
      .filter(length(col("word")) > 0 && length(col("word")) <= MaxWordLen &&
        !col("word").contains("|"))
      .join(broadcast(seg), "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces")).cast("long").as("n_pieces"),
        sum(col("total_cost")).cast("long").as("total_bits"))
  }

  /** One hard-EM refit round: pieces re-counted from the Viterbi
    * segmentations (word frequency × uses in the word's path) —
    * the E-step whose fixed point is the trained unigram inventory.
    */
  def refit(docs: DataFrame, textCol: String): DataFrame =
    segmentWords(docs, textCol)
      .select(col("wc"), explode(split(col("enc"), "\\|")).as("piece"))
      .groupBy(col("piece"))
      .agg(sum(col("wc")).cast("long").as("new_cnt"))

  // ---- DuckDB twins ----

  private def wordCtes(table: String, textCol: String): String =
    s"""wt AS (
       |  SELECT unnest(string_split_regex(trim(coalesce($textCol, '')), '\\s+')) AS word
       |  FROM $table),
       |w AS (
       |  SELECT word, CAST(count(*) AS BIGINT) AS wc FROM wt
       |  WHERE length(word) > 0 AND length(word) <= $MaxWordLen
       |    AND word NOT LIKE '%|%'
       |  GROUP BY word),
       |pi0 AS (
       |  SELECT word, wc, CAST(unnest(range(1, length(word) + 1)) AS BIGINT) AS i
       |  FROM w),
       |pi1 AS (
       |  SELECT word, wc, i,
       |    CAST(unnest(range(1, least($MaxPieceLen, length(word) - i + 1) + 1))
       |      AS BIGINT) AS l
       |  FROM pi0),
       |pi AS (SELECT substr(word, i, l) AS piece, wc FROM pi1),
       |p AS (
       |  SELECT piece, CAST(sum(wc) AS BIGINT) AS cnt FROM pi GROUP BY piece),
       |mk AS (
       |  SELECT piece, cnt FROM p WHERE length(piece) > 1
       |  ORDER BY cnt DESC, piece LIMIT $MaxVocab),
       |kept AS (
       |  SELECT piece, cnt FROM p WHERE length(piece) = 1
       |  UNION ALL SELECT piece, cnt FROM mk),
       |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM kept),
       |inv AS (
       |  SELECT piece, cnt,
       |    CAST(length(bin((SELECT total FROM tot)))
       |      - length(bin(cnt)) + 1 AS BIGINT) AS cost
       |  FROM kept)""".stripMargin

  /** Brute-force min-cost segmentation: enumerate every split via a
    * recursive CTE (word lengths are bounded; parts <= $MaxPieceLen),
    * then take min (cost, path) — the Viterbi argmin by definition.
    */
  private def segCtes(table: String, textCol: String): String =
    wordCtes(table, textCol) + s""",
       |paths(word, pos, cost, path) AS (
       |  SELECT word, 0, CAST(0 AS BIGINT), '' FROM w
       |  UNION ALL
       |  SELECT r.word, r.pos + lens.l, r.cost + inv.cost,
       |    CASE WHEN r.path = '' THEN substr(r.word, r.pos + 1, lens.l)
       |         ELSE r.path || '|' || substr(r.word, r.pos + 1, lens.l) END
       |  FROM paths r
       |  JOIN (VALUES ${(1 to MaxPieceLen).map(l => s"($l)").mkString(",")})
       |    lens(l) ON r.pos + lens.l <= length(r.word)
       |  JOIN inv ON inv.piece = substr(r.word, r.pos + 1, lens.l)),
       |seg AS (
       |  SELECT word, cost, path,
       |    row_number() OVER (PARTITION BY word ORDER BY cost, path) AS rn
       |  FROM paths WHERE pos = length(word)),
       |best AS (
       |  SELECT s.word, wd.wc, s.cost, s.path,
       |    CAST(length(s.path) - length(replace(s.path, '|', '')) + 1 AS BIGINT)
       |      AS n_pieces
       |  FROM seg s JOIN w wd ON wd.word = s.word WHERE s.rn = 1)""".stripMargin

  def inventoryOracleSql(table: String, textCol: String): String =
    s"WITH ${wordCtes(table, textCol)}\nSELECT piece, cnt, cost FROM inv"

  def tokenizeOracleSql(table: String, idCol: String, textCol: String): String =
    s"""WITH RECURSIVE ${segCtes(table, textCol)},
       |dw AS (
       |  SELECT $idCol, unnest(string_split_regex(trim(coalesce($textCol, '')),
       |    '\\s+')) AS word
       |  FROM $table)
       |SELECT $idCol, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(b.n_pieces) AS BIGINT) AS n_pieces,
       |  CAST(sum(b.cost) AS BIGINT) AS total_bits
       |FROM dw JOIN best b USING (word)
       |WHERE length(word) > 0 AND length(word) <= $MaxWordLen
       |  AND word NOT LIKE '%|%'
       |GROUP BY $idCol""".stripMargin

  def refitOracleSql(table: String, textCol: String): String =
    s"""WITH RECURSIVE ${segCtes(table, textCol)},
       |pieceuse AS (
       |  SELECT unnest(string_split(path, '|')) AS piece, wc FROM best)
       |SELECT piece, CAST(sum(wc) AS BIGINT) AS new_cnt
       |FROM pieceuse GROUP BY piece""".stripMargin
}
