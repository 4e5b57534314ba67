package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.config.MappingTarget

/** Schema-mapping compiler (SURVEY P1-P3; reference
  * transform_data.py:36-53, config shape sample_source.yaml:35-45).
  *
  * Semantics preserved exactly:
  *  - flat source path → rename (original column name disappears);
  *  - dotted source path → nested extraction materialized as a NEW
  *    top-level column (original struct column stays);
  *  - entries apply in declaration order (later entries see earlier
  *    renames).
  *
  * Implemented correctly (unlike the reference, which crashes on them):
  *  - struct-valued targets: `customerAddress: {street: address.street}`
  *    compiles to `struct(col("address.street").as("street"), ...)`.
  *
  * The fold produces a chain of projections that Catalyst's
  * CollapseProject rule merges into a single select — declaratively
  * identical to a one-pass projection, so no per-column execution cost
  * at any scale.
  */
object MappingCompiler {

  def compile(mapping: Seq[(String, MappingTarget)]): DataFrame => DataFrame =
    df => mapping.foldLeft(df) { case (acc, (target, spec)) => applyOne(acc, target, spec) }

  private def applyOne(df: DataFrame, target: String, spec: MappingTarget): DataFrame =
    spec match {
      case MappingTarget.Path(path) if !path.contains(".") =>
        df.withColumnRenamed(path, target)
      case MappingTarget.Path(path) =>
        df.withColumn(target, nestedCol(path))
      case MappingTarget.Struct(fields) =>
        df.withColumn(target, structCol(fields))
    }

  /** Dotted path → item access chain, matching the reference's
    * `col(p0)[p1][p2]` (transform_data.py:44-47). getField (not
    * col("a.b")) so map-typed intermediates also work.
    */
  private def nestedCol(path: String): Column = {
    val parts = path.split('.')
    parts.tail.foldLeft(col(parts.head))((c, p) => c.getField(p))
  }

  private def structCol(fields: Seq[(String, MappingTarget)]): Column =
    struct(fields.map {
      case (name, MappingTarget.Path(p)) if !p.contains(".") => col(p).as(name)
      case (name, MappingTarget.Path(p)) => nestedCol(p).as(name)
      case (name, MappingTarget.Struct(sub)) => structCol(sub).as(name)
    }: _*)
}
