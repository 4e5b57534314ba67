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
  *  - entries with a missing field or type are skipped;
  *  - UNKNOWN transform types are skipped silently
  *    (transform_data.py:66-67) — that is part of the DSL;
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
        val fmt = normalizeDateFormat(t.format.getOrElse("yyyy-MM-dd HH:mm:ss"))
        df.withColumn(t.field, to_date(col(t.field), fmt))
      case "timestamp" => // engine extension: full-precision variant of datetime
        val fmt = normalizeDateFormat(t.format.getOrElse("yyyy-MM-dd HH:mm:ss"))
        df.withColumn(t.field, to_timestamp(col(t.field), fmt))
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
}
