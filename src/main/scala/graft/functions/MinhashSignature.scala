package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The full k-minhash signature of a hashed-shingle array in ONE pass:
  * minᵢ over elements h of (h·Aᵢ + Bᵢ) for every permutation i, with
  * Java's native wrapping 64-bit arithmetic.
  *
  * Two reasons this beats the declarative
  * `array((0 until k).map(i => array_min(transform(hs, h => h*Aᵢ+Bᵢ))))`:
  *
  *  - cost: the declarative form traverses the shingle array k times
  *    (k = 22 at the derived threshold-0.5 geometry); this loop
  *    traverses it once, updating k running minima — the dominant
  *    map-side cost of MinHash candidate generation drops ~k-fold in
  *    array-walk overhead;
  *  - ANSI safety: `h * A + B` overflows deliberately (the permutation
  *    family is arithmetic mod 2⁶⁴), which ANSI mode rejects at
  *    runtime. Java `long` arithmetic wraps by definition, so this
  *    expression computes the same family under any session
  *    configuration. (The declarative form remains the reference
  *    implementation; `NearDupSpec` asserts bit-equality in a
  *    non-ANSI session.)
  *
  * Null elements null-poison the whole signature (matches the
  * declarative transform+array_min, where a null element nulls the
  * min); empty arrays yield a null signature likewise (array_min of an
  * empty array is null).
  */
case class MinhashSignature(
    child: Expression,
    mulA: Seq[Long],
    addB: Seq[Long]) extends UnaryExpression {

  require(mulA.nonEmpty && mulA.length == addB.length,
    "one (A, B) pair per permutation")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName needs array<bigint>, got $t")
  }

  private lazy val aArr: Array[Long] = mulA.toArray
  private lazy val bArr: Array[Long] = addB.toArray

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return null
    val k = aArr.length
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      if (hs.isNullAt(j)) return null // null element poisons the signature
      val h = hs.getLong(j)
      var i = 0
      while (i < k) {
        val p = h * aArr(i) + bArr(i)
        if (p < mins(i)) mins(i) = p
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mulA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("addB", bArr, "long[]")
    val k = aArr.length
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val p = ctx.freshName("p")
      val poisoned = ctx.freshName("poisoned")
      s"""
         |int $n = $hs.numElements();
         |boolean $poisoned = ($n == 0);
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; !$poisoned && $j < $n; $j++) {
         |  if ($hs.isNullAt($j)) { $poisoned = true; break; }
         |  long $h = $hs.getLong($j);
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $p = $h * $aRef[$i] + $bRef[$i];
         |    if ($p < $mins[$i]) $mins[$i] = $p;
         |  }
         |}
         |if ($poisoned) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}
