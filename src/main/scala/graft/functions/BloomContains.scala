package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter membership test over a long key.
  *
  * The runtime-filter primitive for shuffle-join pruning
  * ([[graft.ext.BloomJoin]]): the filter is built once over the build
  * (dimension) side's join keys, serialized into the plan, and every
  * probe (fact) row tests membership BEFORE the join's exchange — so
  * the shuffle only ever carries rows that can possibly match, plus
  * the filter's bounded false-positive fraction. The surrounding join
  * removes the false positives, so composing this filter with the join
  * is exact.
  *
  * The deserialized filter is a per-JVM transient lazy; codegen pins it
  * into the generated class via a plan reference object, so the probe
  * is one virtual call on unboxed longs inside whole-stage codegen —
  * no UDF boxing, no per-row deserialization.
  */
case class BloomContains(child: Expression, bloomBytes: Array[Byte])
  extends UnaryExpression with Predicate {

  @transient private lazy val bloom: BloomFilter = BloomFilter.readFrom(bloomBytes)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_contains requires a BIGINT key, got $other")
  }

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def nullSafeEval(v: Any): Any = bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)
}

object BloomContains {
  /** Column wrapper: membership of `key` (cast to long by the caller)
    * in `bloom`, serialized for plan shipping.
    */
  def apply(key: Column, bloom: BloomFilter): Column = {
    val bos = new ByteArrayOutputStream()
    bloom.writeTo(bos)
    org.apache.spark.sql.graft.ColumnBridge.column(
      BloomContains(org.apache.spark.sql.graft.ColumnBridge.expression(key), bos.toByteArray))
  }
}
