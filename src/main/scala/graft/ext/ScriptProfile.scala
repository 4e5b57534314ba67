package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Charset / script sanity profile — the encoding-damage screen the
  * CCNet / mC4 / Dolma lineage runs before any content filter: per
  * document, exact counts of Latin letters, digits, whitespace,
  * CONTROL characters (C0 minus \t \n \r — the signature of binary
  * spill or mojibake) and U+FFFD REPLACEMENT CHARACTERS (the signature
  * of a broken decode), plus a main-script majority gate.
  *
  * `clean` requires zero control/replacement characters AND Latin
  * letters forming at least half of the non-whitespace characters —
  * the "is this mostly text in the expected script" gate. All counts
  * are exact integers (length minus length-after-strip), fractions
  * are exported as `(10^6 · n) div n_chars`, so nothing can flip on a
  * float rounding between engines.
  *
  * Scale: one codegen'd map-only projection — no exchange; regex
  * classes are anchored single-char classes, so the scan is linear in
  * the document with no backtracking.
  */
object ScriptProfile {

  private val ControlClassSpark = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"
  private val ControlClassDuck = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"

  def battery(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val n = length(t).cast("long")
    def classCount(cls: String) =
      (length(t) - length(regexp_replace(t, cls, ""))).cast("long")
    val latin = classCount("[A-Za-z]")
    val digit = classCount("[0-9]")
    val space = classCount("[ \\t\\n\\r]")
    val control = classCount(ControlClassSpark)
    val repl = (length(t) - length(translate(t, "\uFFFD", ""))).cast("long")
    docs.select(
        col(idCol),
        n.as("n_chars"),
        latin.as("n_latin"),
        digit.as("n_digit"),
        space.as("n_space"),
        control.as("n_control"),
        repl.as("n_replacement"),
        (n - latin - digit - space).as("n_other"))
      .withColumn("latin_frac_x1e6",
        expr("case when n_chars = 0 then 0 else (1000000 * n_latin) div n_chars end"))
      .withColumn("digit_frac_x1e6",
        expr("case when n_chars = 0 then 0 else (1000000 * n_digit) div n_chars end"))
      .withColumn("clean",
        col("n_control") === 0 && col("n_replacement") === 0 &&
          col("n_latin") * 2 >= (col("n_chars") - col("n_space")))
  }

  /** DuckDB twin; `laneCte` must define a CTE named
    * `charlane(idCol, t2)`.
    */
  def oracleSql(laneCte: String, idCol: String): String = {
    def cc(cls: String) =
      s"length(t2) - length(regexp_replace(t2, '$cls', '', 'g'))"
    s"""WITH $laneCte,
       |m AS (SELECT $idCol,
       |    CAST(length(t2) AS BIGINT) AS n_chars,
       |    CAST(${cc("[A-Za-z]")} AS BIGINT) AS n_latin,
       |    CAST(${cc("[0-9]")} AS BIGINT) AS n_digit,
       |    CAST(${cc("[ \\t\\n\\r]")} AS BIGINT) AS n_space,
       |    CAST(${cc(ControlClassDuck)} AS BIGINT) AS n_control,
       |    CAST(length(t2) - length(translate(t2, chr(65533), ''))
       |      AS BIGINT) AS n_replacement
       |  FROM charlane)
       |SELECT $idCol, n_chars, n_latin, n_digit, n_space, n_control,
       |  n_replacement,
       |  n_chars - n_latin - n_digit - n_space AS n_other,
       |  CASE WHEN n_chars = 0 THEN 0
       |    ELSE (1000000 * n_latin) // n_chars END AS latin_frac_x1e6,
       |  CASE WHEN n_chars = 0 THEN 0
       |    ELSE (1000000 * n_digit) // n_chars END AS digit_frac_x1e6,
       |  (n_control = 0 AND n_replacement = 0
       |   AND n_latin * 2 >= n_chars - n_space) AS clean
       |FROM m""".stripMargin
  }
}
