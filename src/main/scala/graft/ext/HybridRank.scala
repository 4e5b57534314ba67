package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval rank fusion: reciprocal-rank fusion (RRF) of any
  * number of ranked candidate lists — the standard way a RAG/serving
  * stack combines a lexical (BM25) ranking with a dense (embedding
  * cosine) ranking without score calibration (Cormack, Clarke &
  * Buettcher, SIGIR 2009: RRF outperforms Condorcet and individual
  * rankers; score(d) = Σ_lists 1/(c + rank_list(d)), c = 60).
  *
  * Determinism discipline: each list's contribution 1/(c + rank) is
  * rounded to DECIMAL(18,9) BEFORE the sum, so fusion is
  * associative-exact and engine-identical regardless of list count or
  * join order (the BM25 per-term-score pattern); final order is
  * (rrf_score desc, id asc) — fully tie-broken.
  *
  * Scale: inputs are top-K lists (K rows each — serving-sized, not
  * corpus-sized); the fusion is a K-row full-outer join chain and a
  * K-row sort. The corpus-sized work lives in the upstream rankers,
  * which keep their own bounded shapes (BM25's exchange-free scoring
  * scan, the ANN family's index-scoped probes).
  *
  * Ref behavior: nishant21n/universal-aws-data-pipeline has no
  * retrieval serving; this extends the engine's training-data/serving
  * surface (SURVEY.md §2 J-family) alongside the filtered-ANN ops.
  */
object HybridRank {

  val DefaultC = 60

  /** Fuse `lists` of (name, DataFrame with columns idCol + "rank").
    * Emits idCol, one `<name>_rank` column per list (null when the id
    * is absent from that list), and `rrf_score`; top `k` rows by
    * (rrf_score desc, id asc).
    */
  def rrfFuse(lists: Seq[(String, DataFrame)], idCol: String, k: Int,
      c: Int = DefaultC): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(k >= 1 && c >= 0, s"bad rrf config: k=$k c=$c")
    val renamed = lists.map { case (nm, df) =>
      df.select(col(idCol), col("rank").cast("int").as(s"${nm}_rank"))
    }
    val joined = renamed.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val zero = lit(BigDecimal(0)).cast("decimal(18,9)")
    val terms: Seq[Column] = lists.map { case (nm, _) =>
      coalesce(
        round(lit(1.0) / (lit(c) + col(s"${nm}_rank")), 9).cast("decimal(18,9)"),
        zero)
    }
    joined.select(
        col(idCol) +: lists.map { case (nm, _) => col(s"${nm}_rank") } :+
          terms.reduce(_ + _).cast("double").as("rrf_score"): _*)
      .orderBy(col("rrf_score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Rank column (1-based, fully tie-broken) for a scored list: by
    * `by` columns in the given order. A helper for rankers that emit
    * scores without ranks (BM25's topK).
    */
  def withRank(df: DataFrame, by: Seq[Column]): DataFrame =
    df.withColumn("rank", row_number().over(Window.orderBy(by: _*)))

  /** DuckDB twin of the registered `hybrid_rrf` query: BM25 top-`nLex`
    * (rank by score desc, doc_id) fused with the brute cosine
    * top-`nVec` of query vector 0 (the `bruteTopKNFiltered` replay),
    * RRF with c = [[DefaultC]], top `k`. `lexSql`/`vecSql` are the two
    * rankers' full oracle queries, nested as subqueries so their own
    * CTE chains stay self-contained.
    */
  def rrfOracleSql(lexSql: String, vecSql: String, k: Int,
      c: Int = DefaultC): String =
    s"""WITH lex AS (
       |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id)
       |    AS INT) AS lr
       |  FROM ($lexSql)),
       |den AS (SELECT cid AS doc_id, CAST(rank AS INT) AS vr FROM ($vecSql)),
       |f AS (SELECT coalesce(lex.doc_id, den.doc_id) AS doc_id,
       |        lex.lr AS lex_rank, den.vr AS vec_rank
       |      FROM lex FULL OUTER JOIN den ON lex.doc_id = den.doc_id)
       |SELECT doc_id, lex_rank, vec_rank,
       |  CAST(coalesce(CAST(round(1.0 / ($c + lex_rank), 9) AS DECIMAL(18,9)),
       |         CAST(0 AS DECIMAL(18,9))) +
       |       coalesce(CAST(round(1.0 / ($c + vec_rank), 9) AS DECIMAL(18,9)),
       |         CAST(0 AS DECIMAL(18,9))) AS DOUBLE) AS rrf_score
       |FROM f
       |ORDER BY rrf_score DESC, doc_id LIMIT $k""".stripMargin
}
