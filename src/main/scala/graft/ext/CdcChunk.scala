package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC): split each document at positions
  * where a rolling hash of the last `window` words hits a modulus —
  * the Rabin-style boundary rule that makes chunk boundaries a
  * function of LOCAL CONTENT, not absolute position.
  *
  * Why a corpus pipeline wants this over fixed-stride chunking
  * ([[TextAnalysis]] `doc_chunks`): insert one word at the top of a
  * document and every fixed-stride chunk after it changes, so
  * chunk-level dedup/caching misses the entire tail. Under CDC the
  * boundary decisions downstream of the edit are unchanged — only the
  * chunk(s) overlapping the edit differ (spec-asserted). That
  * shift-resistance is what makes chunk-hash dedup and incremental
  * RAG-index refresh work on drifting corpora.
  *
  * Everything is per-document arithmetic over the word array inside
  * ONE projection — no explode, no shuffle; the output is the chunk
  * table. Word hashes use the md5-prefix integer the rolling
  * fingerprint already established, so the oracle replays boundaries
  * bit-for-bit in SQL.
  */
object CdcChunk {

  /** Hash modulus (fits products in long: P·B < 2^63). */
  private val P = 1000000007L
  /** Polynomial base for the window hash. */
  private val B = 31L

  /** 60-bit md5-prefix word hash mod P — same construction as the
    * rolling fingerprint's per-token hash.
    */
  private def wordHash(w: Column): Column =
    conv(substring(md5(w), 1, 15), 16, 10).cast("long") % P

  /** Chunk table: (idCol, chunk_id, n_words, chunk_hash). A boundary
    * falls AFTER word position i (1-based) when the polynomial hash of
    * words [i-window+1 .. i] ≡ 0 (mod `modulus`); the final word never
    * cuts (a trailing empty chunk would be degenerate). Expected chunk
    * length ≈ `modulus` words beyond the window warm-up.
    *
    * The boundary scan is ONE `aggregate` pass that carries the last
    * `window` word hashes as a ring in its accumulator — O(n·window)
    * integer ops with the md5 array evaluated once per document. The
    * tempting direct form, `filter(positions, i => poly(wh, i))` with
    * `wh = transform(words, md5…)`, inlines the transform into every
    * element_at probe and re-hashes the WHOLE document per position —
    * O(n²·window) md5s/doc; measured 57 s for the sf0.1 corpus vs
    * ~1 s for this shape.
    */
  def chunks(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 4, modulus: Int = 8): DataFrame = {
    require(window >= 1 && modulus >= 1, s"window/modulus must be >= 1")
    val words = split(trim(coalesce(col(textCol), lit(""))), "\\s+")
    // Rolling pass over the hash array: acc = (buf = last <=window
    // hashes, pos = 1-based position, cuts). The window polynomial is
    // refolded over the ≤window-long buffer each step (window is tiny);
    // before the buffer fills, element_at past its end yields NULL →
    // the cut predicate is null → no cut, which matches the
    // [window, n-1] position gate.
    def cutsOf(w: Column): Column = aggregate(
      transform(w, wordHash(_)),
      struct(
        array().cast("array<long>").as("buf"),
        lit(0).as("pos"),
        array().cast("array<int>").as("cuts")),
      (acc, h) => {
        val pos = acc("pos") + 1
        val nb = when(size(acc("buf")) < window, concat(acc("buf"), array(h)))
          .otherwise(concat(slice(acc("buf"), 2, window - 1), array(h)))
        val p = (0 until window).foldLeft(lit(0L)) { (a, k) =>
          (a * B + element_at(nb, k + 1)) % P
        }
        struct(nb.as("buf"), pos.as("pos"),
          when(pos >= window && pos < size(w) && p % modulus === 0,
            concat(acc("cuts"), array(pos))).otherwise(acc("cuts")).as("cuts"))
      },
      acc => acc("cuts"))
    // __cuts is materialized in its own projection and referenced twice
    // below; CollapseProject keeps the boundary (non-cheap expression
    // used more than once), so the aggregate runs once per document.
    docs
      .select(col(idCol), words.as("__w"))
      .select(col(idCol), col("__w"), cutsOf(col("__w")).as("__cuts"))
      .select(col(idCol), col("__w"),
        concat(array(lit(1)), transform(col("__cuts"), c => c + 1)).as("__s"),
        concat(col("__cuts"), array(size(col("__w")))).as("__e"))
      .select(col(idCol),
        posexplode(sequence(lit(0), size(col("__s")) - 1)).as(Seq("chunk_id", "__k")),
        col("__w"), col("__s"), col("__e"))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        (element_at(col("__e"), col("__k") + 1) -
          element_at(col("__s"), col("__k") + 1) + 1).cast("long").as("n_words"),
        md5(array_join(slice(col("__w"),
          element_at(col("__s"), col("__k") + 1),
          element_at(col("__e"), col("__k") + 1) -
            element_at(col("__s"), col("__k") + 1) + 1), " ")).as("chunk_hash"))
  }

  /** DuckDB replay: identical word hash, window polynomial, boundary
    * rule, and slice arithmetic (both sides 1-based).
    */
  def oracleSql(table: String, idCol: String, textCol: String,
      window: Int = 4, modulus: Int = 8): String = {
    val polyExpr = (0 until window).foldLeft("0::BIGINT") { (acc, k) =>
      s"(($acc * $B + wh[i - ${window - 1 - k}]) % $P)"
    }
    s"""WITH w AS (
       |  SELECT $idCol,
       |    string_split_regex(trim(coalesce($textCol, '')), '\\s+') AS words
       |  FROM $table),
       |h AS (
       |  SELECT $idCol, words, len(words) AS n,
       |    list_transform(words,
       |      t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % $P) AS wh
       |  FROM w),
       |c AS (
       |  SELECT $idCol, words, n,
       |    CASE WHEN n > $window
       |      THEN list_filter(range($window, n), i -> $polyExpr % $modulus = 0)
       |      ELSE [] END AS cuts
       |  FROM h),
       |se AS (
       |  SELECT $idCol, words,
       |    list_prepend(1, list_transform(cuts, x -> x + 1)) AS starts,
       |    list_append(cuts, n) AS ends
       |  FROM c),
       |e AS (
       |  SELECT $idCol, words, starts, ends,
       |    unnest(range(1, len(starts) + 1)) AS k
       |  FROM se)
       |SELECT $idCol, CAST(k - 1 AS BIGINT) AS chunk_id,
       |  CAST(ends[k] - starts[k] + 1 AS BIGINT) AS n_words,
       |  md5(array_to_string(list_slice(words, starts[k], ends[k]), ' '))
       |    AS chunk_hash
       |FROM e""".stripMargin
  }
}
