package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter sketch as a mergeable Spark aggregate
  * (TypedImperativeAggregate) — the §2.10 surface beyond scalar
  * expressions: partial sketches build map-side, MERGE at the
  * exchange, and the shuffled state is ≤ k counters per partition
  * regardless of vocabulary size. A plain `groupBy(token).count()`
  * shuffles the full distinct vocabulary; the sketch bounds the
  * exchange at k rows per map partition — the only viable first pass
  * when the vocabulary itself is too large to aggregate exactly.
  *
  * Summary semantics (Misra-Gries '82; merge rule per Agarwal et al.,
  * "Mergeable Summaries", PODS '12): at most `k` counters; an
  * incoming item increments its counter, opens one if fewer than k
  * are live, else decrements ALL counters by one (dropping zeros).
  * Merging sums counters, then restores the k-bound by subtracting
  * the (k+1)-th largest count from every counter and dropping
  * non-positives.
  *
  * Guarantee (preserved under any merge tree, hence under Spark's
  * nondeterministic partial-agg order): for every item,
  *   true_count − N/(k+1) ≤ estimate ≤ true_count,
  * so every item with true_count > N/(k+1) is PRESENT in the sketch.
  * Which borderline items (true ≤ N/(k+1)) also survive DOES depend
  * on merge order — consumers that need a deterministic answer verify
  * candidates with an exact recount restricted to the sketch's items
  * (see `NorthStar.heavyHitters`), which is exact-complete for any
  * threshold above N/(k+1).
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[UTF8String, java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def prettyName: String = "graft_misra_gries"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName needs string, got $t")
  }

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, java.lang.Long] =
    new java.util.HashMap[UTF8String, java.lang.Long](k * 2)

  override def update(
      buf: java.util.HashMap[UTF8String, java.lang.Long],
      input: InternalRow): java.util.HashMap[UTF8String, java.lang.Long] = {
    val v = child.eval(input)
    if (v == null) return buf // nulls carry no frequency mass
    val t = v.asInstanceOf[UTF8String]
    val cur = buf.get(t)
    if (cur != null) buf.put(t, cur + 1L)
    else if (buf.size < k) buf.put(t.clone(), java.lang.Long.valueOf(1L)) // clone: input buffers are reused
    else {
      // Decrement-all step: amortized O(1) per input (each decrement
      // cancels a previous increment).
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
    buf
  }

  override def merge(
      buf: java.util.HashMap[UTF8String, java.lang.Long],
      other: java.util.HashMap[UTF8String, java.lang.Long])
      : java.util.HashMap[UTF8String, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      if (cur != null) buf.put(e.getKey, cur + e.getValue)
      else buf.put(e.getKey, e.getValue) // keys from a deserialized buffer are owned
    }
    if (buf.size > k) {
      // Subtract the (k+1)-th largest count from everything, drop the
      // non-positive rest — the error this injects is what the merged
      // N/(k+1) bound accounts for.
      val counts = new Array[Long](buf.size)
      var i = 0
      val vi = buf.values().iterator()
      while (vi.hasNext) { counts(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - k - 1) // (k+1)-th largest
      val ei = buf.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        if (e.getValue <= cut) ei.remove() else e.setValue(e.getValue - cut)
      }
    }
    buf
  }

  override def eval(buf: java.util.HashMap[UTF8String, java.lang.Long]): Any = {
    val entries = new java.util.ArrayList(buf.entrySet())
    // Deterministic presentation: count desc, item asc.
    entries.sort((a: java.util.Map.Entry[UTF8String, java.lang.Long],
        b: java.util.Map.Entry[UTF8String, java.lang.Long]) => {
      val c = java.lang.Long.compare(b.getValue, a.getValue)
      if (c != 0) c else a.getKey.compareTo(b.getKey)
    })
    val rows = new Array[Any](entries.size())
    var i = 0
    while (i < rows.length) {
      val e = entries.get(i)
      rows(i) = new GenericInternalRow(Array[Any](e.getKey, e.getValue.longValue()))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: java.util.HashMap[UTF8String, java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[UTF8String, java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.put(UTF8String.fromBytes(b), java.lang.Long.valueOf(in.readLong()))
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}

object MisraGriesAgg {
  /** Column-API entry: `misraGries($"token", k)` aggregates to
    * `array<struct<item,est>>` sorted by estimate desc.
    */
  def misraGries(c: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      MisraGriesAgg(org.apache.spark.sql.graft.ColumnBridge.expression(c), k)
        .toAggregateExpression())
}
