package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All hyperplane-LSH band keys of an embedding in one codegen'd
  * expression: bit k of band b is the sign of the (b·r+k)-th sparse ±1
  * projection.
  *
  * The declarative formulation (one Column per band, each nesting
  * rowsPerBand CASEs over nnz-term sums) inlines planes × nnz terms
  * into a single whole-stage-codegen method — at 64 planes × 8 terms
  * the generated method exceeds the JVM's 64 KB limit, and every stage
  * pays a multi-second failed compile before falling back to
  * interpreted eval. This expression emits a constant-size loop over a
  * referenced plane table instead.
  *
  * Float math is identical to the declarative fold: elements widen
  * exactly to double, each plane accumulates left-to-right over its
  * (sorted) dimensions, products by ±1.0 are exact — so the generated
  * DuckDB oracles remain bit-for-bit comparable.
  */
case class SignBandKeys(
    child: Expression,
    dims: Seq[Seq[Int]],
    signs: Seq[Seq[Double]],
    numBands: Int,
    rowsPerBand: Int) extends UnaryExpression {

  require(dims.length == numBands * rowsPerBand && signs.length == dims.length)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_band_keys"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName needs array<float|double>, got $t")
  }

  private lazy val dimsArr: Array[Array[Int]] = dims.map(_.toArray).toArray
  private lazy val signsArr: Array[Array[Double]] = signs.map(_.toArray).toArray
  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    val n = v.numElements()
    val keys = new Array[Int](numBands)
    var b = 0
    while (b < numBands) {
      var key = 0
      var k = 0
      while (k < rowsPerBand) {
        val p = b * rowsPerBand + k
        val ds = dimsArr(p)
        val sg = signsArr(p)
        var s = 0.0
        var valid = true
        var j = 0
        while (valid && j < ds.length) {
          val d = ds(j)
          // A missing or null element null-poisons the projection in
          // the declarative formulation (non-ANSI element_at), leaving
          // the bit unset — reproduced here, never read out of bounds.
          if (d >= n || v.isNullAt(d)) valid = false
          else {
            val x = if (isF) v.getFloat(d).toDouble else v.getDouble(d)
            s += x * sg(j)
          }
          j += 1
        }
        if (valid && s > 0.0) key |= (1 << k)
        k += 1
      }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dimsRef = ctx.addReferenceObj("dims", dimsArr, "int[][]")
    val signsRef = ctx.addReferenceObj("signs", signsArr, "double[][]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val keys = ctx.freshName("keys")
      val n = ctx.freshName("n")
      val b = ctx.freshName("b")
      val k = ctx.freshName("k")
      val p = ctx.freshName("p")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val key = ctx.freshName("key")
      val valid = ctx.freshName("valid")
      s"""
         |int[] $keys = new int[$numBands];
         |int $n = $v.numElements();
         |for (int $b = 0; $b < $numBands; $b++) {
         |  int $key = 0;
         |  for (int $k = 0; $k < $rowsPerBand; $k++) {
         |    int $p = $b * $rowsPerBand + $k;
         |    double $s = 0.0;
         |    boolean $valid = true;
         |    for (int $j = 0; $valid && $j < $dimsRef[$p].length; $j++) {
         |      int $d = $dimsRef[$p][$j];
         |      if ($d >= $n || $v.isNullAt($d)) { $valid = false; }
         |      else { $s += ((double) $v.$get($d)) * $signsRef[$p][$j]; }
         |    }
         |    if ($valid && $s > 0.0) $key |= (1 << $k);
         |  }
         |  $keys[$b] = $key;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignBandKeys =
    copy(child = newChild)
}
