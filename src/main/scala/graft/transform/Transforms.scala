package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StringType}

import graft.config.TransformSpec

/** Config-driven scalar-transform dispatcher (SURVEY T1-T6; reference
  * transform_data.py:55-90, config sample_source.yaml:50-56).
  *
  * Contract preserved exactly:
  *  - transforms apply in declaration order;
  *  - entries with an EMPTY field or type are skipped
  *    (transform_data.py:66-67 `if not field or not transform_type`);
  *  - UNKNOWN transform types are skipped silently — that is part of
  *    the DSL;
  *  - a transform naming a column absent from the frame fails analysis,
  *    exactly as the reference's `col(field)` would — misconfiguration
  *    surfaces loudly rather than silently dropping a declared cast;
  *  - `datetime` parses to DATE (time-of-day truncated), the reference's
  *    behavior even for time-bearing formats (transform_data.py:71).
  *
  * Fixed, not copied: the sample config uses moment-style patterns
  * ("YYYY-MM-DD", sample_source.yaml:53) which are *week-year/day-of-year*
  * in Java — normalizeDateFormat maps them to the intended Java pattern.
  *
  * Every transform is a built-in `org.apache.spark.sql.functions` call —
  * whole-stage-codegen'd, no UDFs (SURVEY §2.10).
  */
object Transforms {

  def compile(transformations: Seq[TransformSpec]): DataFrame => DataFrame =
    df => transformations.foldLeft(df)(applyOne)

  private[transform] def applyOne(df: DataFrame, t: TransformSpec): DataFrame = {
    if (t.field.isEmpty || t.kind.isEmpty) return df
    t.kind match {
      case "datetime" =>
        df.withColumn(t.field, to_date(col(t.field), validFormat(t)))
      case "timestamp" => // engine extension: full-precision variant of datetime
        df.withColumn(t.field, to_timestamp(col(t.field), validFormat(t)))
      case "string"  => df.withColumn(t.field, col(t.field).cast(StringType))
      case "integer" => df.withColumn(t.field, col(t.field).cast(IntegerType))
      case "double"  => df.withColumn(t.field, col(t.field).cast(DoubleType))
      case "trim"    => df.withColumn(t.field, trim(col(t.field)))
      case "regexp_replace" =>
        df.withColumn(t.field,
          regexp_replace(col(t.field), t.pattern.getOrElse(""), t.replacement.getOrElse("")))
      case _ => df // unknown type: silently skipped — DSL contract
    }
  }

  /** Moment/strftime-style pattern → Java DateTimeFormatter pattern. */
  private[transform] def normalizeDateFormat(fmt: String): String =
    fmt
      .replace("YYYY", "yyyy") // moment year (Java YYYY = week-based year)
      .replace("DD", "dd")     // moment day-of-month (Java DD = day-of-year)

  /** Malformed format PATTERNS (unlike malformed values, which become
    * nulls) are config errors — validated at plan-construction time so
    * a typo fails the job before it launches, not on an executor
    * mid-run.
    */
  private def validFormat(t: TransformSpec): String = {
    val fmt = normalizeDateFormat(t.format.getOrElse("yyyy-MM-dd HH:mm:ss"))
    try { java.time.format.DateTimeFormatter.ofPattern(fmt); fmt }
    catch {
      case e: IllegalArgumentException =>
        throw new IllegalArgumentException(
          s"invalid ${t.kind} format '${t.format.get}' for field '${t.field}'", e)
    }
  }
}
