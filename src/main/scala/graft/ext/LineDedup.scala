package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level duplicate-segment removal — the C4 / RefinedWeb "line
  * dedup" curation stage: a segment of text that recurs across the
  * corpus at least `minCount` times is boilerplate (headers, footers,
  * license blurbs, navigation chrome) and is struck from EVERY document
  * it appears in; the surviving segments are reassembled in original
  * order.
  *
  * The fixture corpus has no newlines, so segmentation is fixed
  * `segWords`-word windows (the last window may be short) — the
  * segment-boundary rule is a parameter of the operator, not of the
  * algorithm.
  *
  * Scale shape: segments explode map-side; the frequency count is one
  * partial-aggregated exchange keyed by segment; the banned set (only
  * segments above threshold — by construction a tiny fraction) comes
  * back as a BROADCAST anti-join, so the corpus-sized segment stream is
  * never shuffled for the membership test; reassembly is one exchange
  * keyed by doc id. Raw document text crosses the wire only inside its
  * own segments — never as a whole-row payload. At 100 TB the count
  * exchange carries (segment, 1) pairs with map-side combine; a hashed
  * variant (xxhash64(segment) as the grouping key) cuts that further
  * at the price of an astronomically-unlikely hash collision — the
  * exact-text key is kept here because the gate demands bit-exactness.
  */
object LineDedup {

  /** Per-document cleaned text after corpus-level segment dedup:
    * (idCol, clean_text, n_kept, n_removed). A document whose every
    * segment is banned survives with empty text — row loss would
    * silently shrink the corpus manifest.
    */
  def dedupSegments(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      segWords: Int,
      minCount: Long): DataFrame = {
    val words = split(trim(coalesce(col(textCol), lit(""))), "\\s+")
    // >= 1 always (split of "" is [""]), so sequence(0, n-1) is ascending.
    val nSegs: Column = ceil(size(words).cast("double") / segWords).cast("int")
    val segArr = transform(
      sequence(lit(0), nSegs - 1),
      i => array_join(slice(words, i * segWords + 1, lit(segWords)), " "))

    val segs = docs
      .select(col(idCol), posexplode(segArr).as(Seq("seg_idx", "seg")))
    val banned = segs
      .groupBy(col("seg")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .select(col("seg"))
    val kept = segs.join(broadcast(banned), Seq("seg"), "left_anti")
    val reassembled = kept
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("seg_idx"), col("seg")))),
            s => s("seg")),
          " ").as("clean_text"))

    docs.select(col(idCol), nSegs.cast("long").as("__n_segs"))
      .join(reassembled, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).cast("long").as("n_kept"),
        (col("__n_segs") - coalesce(col("n_kept"), lit(0L))).cast("long").as("n_removed"))
  }

  /** DuckDB replay: same segmentation arithmetic (1-based list slices),
    * same threshold, same space-joined reassembly ordered by segment
    * index.
    */
  def oracleSql(table: String, idCol: String, textCol: String,
      segWords: Int, minCount: Long): String =
    s"""WITH w AS (
       |  SELECT $idCol, string_split_regex(trim(coalesce($textCol, '')), '\\s+') AS words
       |  FROM $table),
       |n AS (SELECT $idCol, words,
       |  CAST(ceil(len(words) * 1.0 / $segWords) AS BIGINT) AS n_segs FROM w),
       |seg AS (
       |  SELECT $idCol, CAST(unnest(range(n_segs)) AS BIGINT) AS seg_idx, words
       |  FROM n),
       |st AS (
       |  SELECT $idCol, seg_idx,
       |    array_to_string(list_slice(words, seg_idx * $segWords + 1,
       |      seg_idx * $segWords + $segWords), ' ') AS seg
       |  FROM seg),
       |banned AS (
       |  SELECT seg FROM st GROUP BY seg HAVING count(*) >= $minCount),
       |kept AS (
       |  SELECT $idCol, seg_idx, seg FROM st
       |  WHERE seg NOT IN (SELECT seg FROM banned)),
       |agg AS (
       |  SELECT $idCol,
       |    string_agg(seg, ' ' ORDER BY seg_idx) AS clean_text,
       |    CAST(count(*) AS BIGINT) AS n_kept
       |  FROM kept GROUP BY $idCol)
       |SELECT n.$idCol,
       |  coalesce(agg.clean_text, '') AS clean_text,
       |  coalesce(agg.n_kept, 0) AS n_kept,
       |  n.n_segs - coalesce(agg.n_kept, 0) AS n_removed
       |FROM n LEFT JOIN agg ON n.$idCol = agg.$idCol""".stripMargin
}
