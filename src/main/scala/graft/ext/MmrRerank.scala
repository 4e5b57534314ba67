package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998)
  * — the standard diversity pass over a retrieval candidate list: pick
  * greedily, each step taking the candidate maximizing
  * `relevance − max-similarity-to-already-selected` (the λ = 1/2 MMR
  * objective up to a positive scale, which cannot change any argmax).
  *
  * Selection is deterministic cross-engine by the same recipe as the
  * `sim_topk` family: every cosine is rounded to 6 decimals FIRST, so
  * both engines run the greedy over identical doubles, and every
  * argmax tie-breaks by candidate id.
  *
  * Scale shape: the query side is bounded and broadcast; candidate
  * generation is the existing brute/ANN top-m (per-query heaps, corpus
  * never shuffles); the pairwise-similarity table is m² rows PER QUERY
  * (index-scoped, never corpus-scoped); and the k greedy steps are
  * qid-keyed joins over those bounded frames. Swapping the brute
  * candidate stage for an ANN index changes nothing downstream — brute
  * is the oracle-replayable baseline.
  */
object MmrRerank {

  /** Greedy MMR top-k over the brute top-m candidates of each query
    * (`vec_id < queryBound`). Output: (qid, cid, rank, score) where
    * rank 1's score is the plain relevance and later ranks carry
    * `round(rel − max sim to selected, 6)`.
    *
    * `candWhere` pre-filters the candidate side (the filtered-serving
    * contract of `sim_topk_filtered`: every retrieved row eligible by
    * construction, never post-filter under-return); at scale the
    * predicate pushes into the candidate scan.
    */
  def rerank(emb: DataFrame, queryBound: Int, m: Int, k: Int,
             candWhere: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(k >= 1 && m >= k, s"need m >= k >= 1, got m=$m k=$k")
    val nd = graft.functions.DotProduct.fn(emb.sparkSession)
    val e = emb.select(col("vec_id"), col("embedding"),
      sqrt(nd(col("embedding"), col("embedding"))).as("__n"))
    val q = e.filter(col("vec_id") < queryBound)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        col("__n").as("qn"))
    val c = candWhere.fold(emb)(emb.filter)
      .select(col("vec_id"), col("embedding"),
        sqrt(nd(col("embedding"), col("embedding"))).as("__n"))
      .select(col("vec_id").as("cid"), col("embedding").as("cv"),
        col("__n").as("cn"))

    val wRel = Window.partitionBy(col("qid"))
      .orderBy(col("rel").desc, col("cid").asc)
    // localCheckpoint: the greedy loop below re-reads these bounded
    // frames k times each — without the lineage cut, every step
    // re-runs the corpus-wide brute scan (the BpeTrain/pagerank
    // pattern; qB·m rows, KB-scale).
    val cand = broadcast(q).join(c, col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), col("cv"), col("cn"),
        round(nd(col("qv"), col("cv")) / (col("qn") * col("cn")), 6).as("rel"))
      .withColumn("__rn", row_number().over(wRel))
      .filter(col("__rn") <= m)
      .select("qid", "cid", "cv", "cn", "rel")
      .localCheckpoint()

    val a = cand.select(col("qid"), col("cid").as("i"),
      col("cv").as("iv"), col("cn").as("inn"))
    val b = cand.select(col("qid"), col("cid").as("j"),
      col("cv").as("jv"), col("cn").as("jn"))
    val pair = a.join(b, Seq("qid")).filter(col("i") =!= col("j"))
      .select(col("qid"), col("i"), col("j"),
        round(nd(col("iv"), col("jv")) / (col("inn") * col("jn")), 6).as("s"))
      .localCheckpoint()

    val candSlim = cand.select("qid", "cid", "rel")
    var selected = candSlim
      .withColumn("__rn", row_number().over(wRel)).filter(col("__rn") === 1)
      .select(col("qid"), col("cid"), lit(1).as("rank"),
        col("rel").as("score"))

    for (r <- 2 to k) {
      val remaining = candSlim
        .join(selected.select("qid", "cid"), Seq("qid", "cid"), "left_anti")
      // Every remaining candidate pairs with every selected one (the
      // pair table is complete over the candidate set), so the inner
      // joins below never drop a contender.
      val pen = pair
        .join(selected.select(col("qid"), col("cid").as("j")), Seq("qid", "j"))
        .groupBy(col("qid"), col("i"))
        .agg(max(col("s")).as("__pen"))
        .select(col("qid"), col("i").as("cid"), col("__pen"))
      val wScore = Window.partitionBy(col("qid"))
        .orderBy(col("score").desc, col("cid").asc)
      val next = remaining.join(pen, Seq("qid", "cid"))
        .select(col("qid"), col("cid"),
          round(col("rel") - col("__pen"), 6).as("score"))
        .withColumn("__rn", row_number().over(wScore))
        .filter(col("__rn") === 1)
        .select(col("qid"), col("cid"), lit(r).as("rank"), col("score"))
      selected = selected.unionByName(next).localCheckpoint()
    }
    selected
  }

  /** DuckDB twin: the k greedy steps unrolled as CTEs, each replaying
    * the rounded-cosine scores and the (score DESC, cid ASC) argmax.
    * `candSql` is the candidate-side predicate over alias `c`
    * (mirrors `candWhere`).
    */
  def oracleSql(queryBound: Int, m: Int, k: Int,
                candSql: Option[String] = None): String = {
    val candPred = candSql.fold("")(p => s" AND $p")
    val steps = (2 to k).map { r =>
      s"""sc$r AS (SELECT c.qid, c.cid,
         |    round(c.rel - (SELECT max(p.s) FROM pair p
         |                   JOIN sel${r - 1} t ON t.qid = p.qid AND t.cid = p.j
         |                   WHERE p.qid = c.qid AND p.i = c.cid), 6) AS score
         |  FROM cand c
         |  WHERE NOT EXISTS (SELECT 1 FROM sel${r - 1} t
         |                    WHERE t.qid = c.qid AND t.cid = c.cid)),
         |pk$r AS (SELECT qid, cid, $r AS rank, score FROM (
         |    SELECT qid, cid, score, row_number() OVER (
         |      PARTITION BY qid ORDER BY score DESC, cid ASC) AS rn
         |    FROM sc$r) WHERE rn = 1),
         |sel$r AS (SELECT * FROM sel${r - 1} UNION ALL SELECT * FROM pk$r)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH v AS (SELECT vec_id, label,
       |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cand0 AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
       |    round(list_cosine_similarity(q.v, c.v), 6) AS rel
       |  FROM v q JOIN v c ON q.vec_id <> c.vec_id$candPred
       |  WHERE q.vec_id < $queryBound),
       |cand AS (SELECT qid, cid, rel FROM (
       |    SELECT qid, cid, rel, row_number() OVER (
       |      PARTITION BY qid ORDER BY rel DESC, cid ASC) AS rn
       |    FROM cand0) WHERE rn <= $m),
       |pair AS (SELECT a.qid, a.cid AS i, b.cid AS j,
       |    round(list_cosine_similarity(va.v, vb.v), 6) AS s
       |  FROM cand a JOIN cand b ON a.qid = b.qid AND a.cid <> b.cid
       |  JOIN v va ON va.vec_id = a.cid
       |  JOIN v vb ON vb.vec_id = b.cid),
       |sel1 AS (SELECT qid, cid, 1 AS rank, rel AS score FROM (
       |    SELECT qid, cid, rel, row_number() OVER (
       |      PARTITION BY qid ORDER BY rel DESC, cid ASC) AS rn
       |    FROM cand) WHERE rn = 1),
       |$steps
       |SELECT qid, cid, CAST(rank AS INT) AS rank, score FROM sel$k"""
      .stripMargin
  }
}
