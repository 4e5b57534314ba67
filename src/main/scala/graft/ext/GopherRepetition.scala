package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The COMPLETE Gopher repetition-rule battery (Rae et al. 2021,
  * table A1) — all 13 published rows in exact integers:
  *
  *   - duplicate line fraction ≤ 0.30, duplicate paragraph fraction
  *     ≤ 0.30 (occurrences beyond the first, over `\r?\n` / blank-line
  *     segmentation),
  *   - duplicate line / paragraph CHARACTER fraction ≤ 0.20,
  *   - top 2-/3-/4-gram character fraction ≤ 0.20 / 0.18 / 0.16
  *     (characters of all occurrences of the most frequent word
  *     n-gram over total word characters),
  *   - duplicate 5-..10-gram character fraction ≤ 0.15 / 0.14 / 0.13
  *     / 0.12 / 0.11 / 0.10 — the fraction of characters covered by
  *     ANY n-gram occurring more than once, counting each covered
  *     word position ONCE (the paper's "taking care not to count
  *     characters in overlapping n-grams more than once").
  *
  * The existing `rep_ratio` operator stays as the cheap two-signal
  * screen (top word + duplicate bigram); this battery is the full
  * published set for pipelines that want table-A1 fidelity.
  *
  * Character counts are WORD characters (whitespace excluded), the
  * convention that makes line/paragraph/n-gram denominators agree.
  * Every fraction is exported as the scaled integer
  * `(10^6 · num) div den` and every threshold is an exact integer
  * cross-multiplication, so a pass/fail can never flip on a float
  * rounding between engines.
  *
  * Scale: the line/paragraph half is one codegen'd map-only
  * projection. The n-gram half shuffles (doc, xxhash64(gram)) pairs —
  * never gram text — keyed by doc id, the same per-doc-vocabulary
  * exchange bound as `rep_ratio`'s word count; duplicate-position
  * marking joins instance positions (≤ 10 rows per dup instance)
  * back to per-position word lengths, all doc-keyed. A 64-bit gram
  * collision within one document could merge two counts (~2⁻⁶⁴ per
  * pair — the NearDup trade); the oracle replays gram TEXT.
  */
object GopherRepetition {

  /** (n → (threshold numerator, denominator)): top n-gram char
    * fraction limits (Rae et al. table A1).
    */
  val TopGramMax: Seq[(Int, (Int, Int))] =
    Seq(2 -> (20, 100), 3 -> (18, 100), 4 -> (16, 100))

  /** (n → (threshold numerator, denominator)): duplicate n-gram char
    * fraction limits.
    */
  val DupGramMax: Seq[(Int, (Int, Int))] =
    Seq(5 -> (15, 100), 6 -> (14, 100), 7 -> (13, 100),
      8 -> (12, 100), 9 -> (11, 100), 10 -> (10, 100))

  def battery(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = coalesce(col(textCol), lit(""))
    val trimNonEmpty = (a: Column) =>
      filter(transform(a, x => trim(x)), x => length(x) > 0)
    val lines = trimNonEmpty(split(text, "\\r?\\n"))
    val paras = trimNonEmpty(split(text, "\\r?\\n\\r?\\n"))
    val charSum = (a: Column) =>
      aggregate(a, lit(0L), (acc, x) => acc + length(x))

    val mapOnly = docs.select(
      col(idCol),
      size(lines).cast("long").as("n_lines"),
      (size(lines) - size(array_distinct(lines))).cast("long").as("n_dup_lines"),
      charSum(lines).as("line_chars"),
      (charSum(lines) - charSum(array_distinct(lines))).as("dup_line_chars"),
      size(paras).cast("long").as("n_paras"),
      (size(paras) - size(array_distinct(paras))).cast("long").as("n_dup_paras"),
      charSum(paras).as("para_chars"),
      (charSum(paras) - charSum(array_distinct(paras))).as("dup_para_chars"))

    val base = docs.select(col(idCol).as("__id"),
      filter(split(trim(text), "\\s+"), w => length(w) > 0).as("__ws"))
    val tot = base.select(col("__id"),
      aggregate(col("__ws"), lit(0L), (acc, w) => acc + length(w))
        .as("total_chars"))
    val lens = base.select(col("__id"),
      posexplode(transform(col("__ws"), w => length(w).cast("long")))
        .as(Seq("p", "wlen")))

    // (doc, pos, gram-hash, gram word chars) instances for one n.
    def grams(n: Int): DataFrame =
      base.filter(size(col("__ws")) >= n)
        .select(col("__id"), posexplode(transform(
          sequence(lit(0), size(col("__ws")) - n),
          i => {
            val g = concat_ws(" ", slice(col("__ws"), i + 1, lit(n)))
            struct(xxhash64(g).as("h"),
              (length(g) - lit(n - 1)).cast("long").as("chars"))
          })).as(Seq("pos", "g")))
        .select(col("__id"), col("pos"),
          col("g").getField("h").as("h"), col("g").getField("chars").as("chars"))

    // top n-gram: chars of all occurrences of the most frequent gram
    // (max count, ties to the longer gram — same (count, chars) pair
    // always yields the same numerator either way).
    def topNum(n: Int): DataFrame =
      grams(n).groupBy(col("__id"), col("h"))
        .agg(count(lit(1)).as("c"), max(col("chars")).as("chars"))
        .groupBy(col("__id"))
        .agg(max(struct(col("c"), col("chars"))).as("m"))
        .select(col("__id"),
          (col("m").getField("c") * col("m").getField("chars"))
            .as(s"top${n}_num"))

    // duplicate n-gram covered chars: word positions under any gram
    // with count >= 2, each position once.
    def dupChars(n: Int): DataFrame = {
      val g = grams(n)
      val dupKeys = g.groupBy(col("__id"), col("h"))
        .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
        .select("__id", "h")
      g.join(dupKeys, Seq("__id", "h"))
        .select(col("__id"),
          explode(sequence(col("pos"), col("pos") + (n - 1))).as("p"))
        .distinct()
        .join(lens, Seq("__id", "p"))
        .groupBy(col("__id"))
        .agg(sum(col("wlen")).as(s"dup${n}_chars"))
    }

    val gramFrames = tot +:
      (TopGramMax.map { case (n, _) => topNum(n) } ++
        DupGramMax.map { case (n, _) => dupChars(n) })
    val joined = gramFrames.reduce((a, b) => a.join(b, Seq("__id"), "left"))
    val assembled = mapOnly.join(
      joined.withColumnRenamed("__id", idCol), Seq(idCol), "left")

    val fill = (Seq("total_chars") ++
      TopGramMax.map { case (n, _) => s"top${n}_num" } ++
      DupGramMax.map { case (n, _) => s"dup${n}_chars" })
      .foldLeft(assembled) { (df, c) =>
        df.withColumn(c, coalesce(col(c), lit(0L)))
      }

    val fracCols =
      Seq(
        "case when n_lines = 0 then 0 else (1000000 * n_dup_lines) div n_lines end as dup_line_frac_x1e6",
        "case when line_chars = 0 then 0 else (1000000 * dup_line_chars) div line_chars end as dup_line_char_frac_x1e6",
        "case when n_paras = 0 then 0 else (1000000 * n_dup_paras) div n_paras end as dup_para_frac_x1e6",
        "case when para_chars = 0 then 0 else (1000000 * dup_para_chars) div para_chars end as dup_para_char_frac_x1e6") ++
      TopGramMax.map { case (n, _) =>
        s"case when total_chars = 0 then 0 else (1000000 * top${n}_num) div total_chars end as top_${n}gram_frac_x1e6"
      } ++
      DupGramMax.map { case (n, _) =>
        s"case when total_chars = 0 then 0 else (1000000 * dup${n}_chars) div total_chars end as dup_${n}gram_frac_x1e6"
      }
    val passSql = (
      Seq(
        "n_dup_lines * 10 <= n_lines * 3",
        "dup_line_chars * 5 <= line_chars",
        "n_dup_paras * 10 <= n_paras * 3",
        "dup_para_chars * 5 <= para_chars") ++
      TopGramMax.map { case (n, (tn, td)) =>
        s"top${n}_num * $td <= total_chars * $tn" } ++
      DupGramMax.map { case (n, (tn, td)) =>
        s"dup${n}_chars * $td <= total_chars * $tn" }
      ).mkString("(", " and ", ") as passes")

    fill.selectExpr(
      (Seq(idCol, "n_lines", "n_dup_lines", "n_paras", "n_dup_paras",
        "total_chars") ++ fracCols :+ passSql): _*)
  }

  /** DuckDB twin of [[battery]]; `laneCte` must define a CTE named
    * `replane(idCol, t2)` supplying the newline-bearing text.
    */
  def oracleSql(laneCte: String, idCol: String): String = {
    val topCtes = TopGramMax.map { case (n, _) =>
      s"""gi$n AS (SELECT $idCol, unnest(range(0, len(ws) - $n + 1)) AS pos, ws
         |  FROM w WHERE len(ws) >= $n),
         |gg$n AS (SELECT $idCol, pos,
         |    array_to_string(ws[pos + 1 : pos + $n], ' ') AS g
         |  FROM gi$n),
         |gc$n AS (SELECT $idCol, g, count(*) AS c,
         |    CAST(length(g) - ${n - 1} AS BIGINT) AS chars
         |  FROM gg$n GROUP BY $idCol, g),
         |tp$n AS (SELECT $idCol, c * chars AS top${n}_num FROM (
         |    SELECT $idCol, c, chars, row_number() OVER (
         |      PARTITION BY $idCol ORDER BY c DESC, chars DESC) AS rn
         |    FROM gc$n) WHERE rn = 1)""".stripMargin
    }
    val dupCtes = DupGramMax.map { case (n, _) =>
      s"""gi$n AS (SELECT $idCol, unnest(range(0, len(ws) - $n + 1)) AS pos, ws
         |  FROM w WHERE len(ws) >= $n),
         |gg$n AS (SELECT $idCol, pos,
         |    array_to_string(ws[pos + 1 : pos + $n], ' ') AS g
         |  FROM gi$n),
         |dk$n AS (SELECT $idCol, g FROM gg$n
         |  GROUP BY $idCol, g HAVING count(*) >= 2),
         |dp$n AS (SELECT DISTINCT $idCol, p FROM (
         |    SELECT i.$idCol, unnest(range(i.pos, i.pos + $n)) AS p
         |    FROM gg$n i JOIN dk$n d USING ($idCol, g))),
         |ds$n AS (SELECT $idCol, CAST(sum(wlen) AS BIGINT) AS dup${n}_chars
         |  FROM dp$n JOIN wl USING ($idCol, p) GROUP BY $idCol)""".stripMargin
    }
    val joins = TopGramMax.map { case (n, _) =>
      s"LEFT JOIN tp$n USING ($idCol)" } ++
      DupGramMax.map { case (n, _) => s"LEFT JOIN ds$n USING ($idCol)" }
    val fracSelect =
      Seq(
        s"CASE WHEN n_lines = 0 THEN 0 ELSE (1000000 * n_dup_lines) // n_lines END AS dup_line_frac_x1e6",
        s"CASE WHEN line_chars = 0 THEN 0 ELSE (1000000 * dup_line_chars) // line_chars END AS dup_line_char_frac_x1e6",
        s"CASE WHEN n_paras = 0 THEN 0 ELSE (1000000 * n_dup_paras) // n_paras END AS dup_para_frac_x1e6",
        s"CASE WHEN para_chars = 0 THEN 0 ELSE (1000000 * dup_para_chars) // para_chars END AS dup_para_char_frac_x1e6") ++
      TopGramMax.map { case (n, _) =>
        s"CASE WHEN total_chars = 0 THEN 0 ELSE (1000000 * coalesce(top${n}_num, 0)) // total_chars END AS top_${n}gram_frac_x1e6" } ++
      DupGramMax.map { case (n, _) =>
        s"CASE WHEN total_chars = 0 THEN 0 ELSE (1000000 * coalesce(dup${n}_chars, 0)) // total_chars END AS dup_${n}gram_frac_x1e6" }
    val passSql = (
      Seq(
        "n_dup_lines * 10 <= n_lines * 3",
        "dup_line_chars * 5 <= line_chars",
        "n_dup_paras * 10 <= n_paras * 3",
        "dup_para_chars * 5 <= para_chars") ++
      TopGramMax.map { case (n, (tn, td)) =>
        s"coalesce(top${n}_num, 0) * $td <= total_chars * $tn" } ++
      DupGramMax.map { case (n, (tn, td)) =>
        s"coalesce(dup${n}_chars, 0) * $td <= total_chars * $tn" }
      ).mkString("(", " AND ", ") AS passes")
    s"""WITH $laneCte,
       |w AS (SELECT $idCol,
       |    list_filter(string_split_regex(trim(t2), '\\s+'),
       |      x -> length(x) > 0) AS ws
       |  FROM replane),
       |lp AS (SELECT $idCol,
       |    list_filter(list_transform(string_split_regex(t2, '\r?\n'),
       |      x -> trim(x)), x -> length(x) > 0) AS ls,
       |    list_filter(list_transform(string_split_regex(t2, '\r?\n\r?\n'),
       |      x -> trim(x)), x -> length(x) > 0) AS ps
       |  FROM replane),
       |lm AS (SELECT $idCol,
       |    CAST(len(ls) AS BIGINT) AS n_lines,
       |    CAST(len(ls) - len(list_distinct(ls)) AS BIGINT) AS n_dup_lines,
       |    CAST(coalesce(list_sum(list_transform(ls, x -> length(x))), 0)
       |      AS BIGINT) AS line_chars,
       |    CAST(coalesce(list_sum(list_transform(ls, x -> length(x))), 0)
       |      - coalesce(list_sum(list_transform(list_distinct(ls),
       |          x -> length(x))), 0) AS BIGINT) AS dup_line_chars,
       |    CAST(len(ps) AS BIGINT) AS n_paras,
       |    CAST(len(ps) - len(list_distinct(ps)) AS BIGINT) AS n_dup_paras,
       |    CAST(coalesce(list_sum(list_transform(ps, x -> length(x))), 0)
       |      AS BIGINT) AS para_chars,
       |    CAST(coalesce(list_sum(list_transform(ps, x -> length(x))), 0)
       |      - coalesce(list_sum(list_transform(list_distinct(ps),
       |          x -> length(x))), 0) AS BIGINT) AS dup_para_chars
       |  FROM lp),
       |tot AS (SELECT $idCol,
       |    CAST(coalesce(list_sum(list_transform(ws, x -> length(x))), 0)
       |      AS BIGINT) AS total_chars
       |  FROM w),
       |wl AS (SELECT $idCol, p, CAST(length(ws[p + 1]) AS BIGINT) AS wlen
       |  FROM (SELECT $idCol, unnest(range(0, len(ws))) AS p, ws FROM w)),
       |${(topCtes ++ dupCtes).mkString(",\n")}
       |SELECT lm.$idCol, n_lines, n_dup_lines, n_paras, n_dup_paras,
       |  total_chars,
       |  ${fracSelect.mkString(",\n  ")},
       |  $passSql
       |FROM lm JOIN tot USING ($idCol)
       |${joins.mkString("\n")}""".stripMargin
  }
}
