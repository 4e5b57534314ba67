package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The backward as-of join as a CUSTOM PHYSICAL OPERATOR — the
  * deepest extension rung ((c) in the ladder: LogicalPlan + Strategy +
  * SparkPlan) where the composed encodings ((a), `ext/AsofJoin`) stop
  * paying: the exec declares its distribution and ordering
  * REQUIREMENTS and lets EnsureRequirements plan the exchanges/sorts,
  * then merges the two sorted streams in ONE forward pass per
  * partition — no union row-widening (the window encoding carries
  * null-padded both-sides structs through the exchange), no window
  * state machine, and the output keeps the left side's partitioning
  * AND ordering, so a downstream per-key aggregate or window plans
  * with zero additional exchanges — the property the union encoding
  * structurally cannot offer (its output partitioning is the union's).
  *
  * Semantics are [[graft.ext.AsofJoin.asofBackward]]'s exactly (the
  * DuckDB native-ASOF oracle gates both): for each left row, the right
  * row with the greatest right-time ≤ left-time for the same key;
  * ties match; null left key/time ⇒ null payload; right rows with
  * null key/time can never match; the right side is unique per
  * (key, time).
  *
  * The merge is O(|L| + |R|) per partition with O(1) state (one
  * buffered right row + the last matching payload, copied out of the
  * reused row buffer).
  */
final case class AsofJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    leftTime: Attribute,
    rightKey: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

final case class GraftAsofExec(
    leftKey: Attribute,
    leftTime: Attribute,
    rightKey: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  /** Both sides clustered on their key — EnsureRequirements
    * co-partitions them (the SortMergeJoin contract).
    */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  /** Both sides sorted by (key, time) — EnsureRequirements inserts the
    * SortExecs; the merge below assumes exactly this order.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  /** The pass-through contract downstream operators plan against. */
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): GraftAsofExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val (lk0, lt0) = (leftKey, leftTime)
    val (rk0, rt0) = (rightKey, rightTime)
    val payload0 = payload
    left.execute().zipPartitions(right.execute()) { (lIt, rIt0) =>
      import org.apache.spark.sql.catalyst.expressions.Expression
      val lKeyB: Expression = BindReferences.bindReference(lk0: Expression, lOut)
      val lTimeB: Expression = BindReferences.bindReference(lt0: Expression, lOut)
      val rKeyB: Expression = BindReferences.bindReference(rk0: Expression, rOut)
      val rTimeB: Expression = BindReferences.bindReference(rt0: Expression, rOut)
      val payloadProj = UnsafeProjection.create(payload0, rOut)
      val keyOrd = TypeUtils.getInterpretedOrdering(lk0.dataType)
      val timeOrd = TypeUtils.getInterpretedOrdering(lt0.dataType)
      val rIt = rIt0.buffered
      val joiner = new JoinedRow
      // Downstream consumers (and SparkPlan's byte-array collect path)
      // require UnsafeRows — flatten each JoinedRow through the
      // standard result projection. The INPUT schema must declare the
      // payload slots nullable too: bound against the right side's
      // non-null attrs, codegen skips the null check and a missing
      // match reads as 0, not NULL.
      val nullablePayload = payload0.map(_.withNullability(true))
      val resultProj = UnsafeProjection.create(
        lOut ++ nullablePayload, lOut ++ nullablePayload)
      val nullPayload = new GenericInternalRow(payload0.size)
      new Iterator[InternalRow] {
        // The key the remembered payload belongs to — copied out of the
        // reused row buffer (UTF8String/array keys would dangle).
        private var matchKey: Any = null
        private var matchPayload: InternalRow = null
        override def hasNext: Boolean = lIt.hasNext
        override def next(): InternalRow = {
          val l = lIt.next()
          val lk = lKeyB.eval(l)
          val lt = lTimeB.eval(l)
          if (lk == null || lt == null) return resultProj(joiner(l, nullPayload))
          if (matchKey != null && keyOrd.compare(matchKey, lk) != 0) {
            matchKey = null; matchPayload = null
          }
          var done = false
          while (!done && rIt.hasNext) {
            val h = rIt.head
            val rk = rKeyB.eval(h)
            val rt = rTimeB.eval(h)
            if (rk == null || rt == null) rIt.next() // can never match; sorted first
            else {
              val ck = keyOrd.compare(rk, lk)
              if (ck < 0) rIt.next() // left keys only grow — stale forever
              else if (ck == 0 && timeOrd.compare(rt, lt) <= 0) {
                // newest candidate so far for this key: consume+remember
                matchKey = InternalRow.copyValue(lk)
                matchPayload = payloadProj(rIt.next()).copy()
              } else done = true // future key or future time — leave buffered
            }
          }
          resultProj(joiner(l,
            if (matchKey != null && keyOrd.compare(matchKey, lk) == 0) matchPayload
            else nullPayload))
        }
      }
    }
  }
}

/** The engine's strategy: plans [[AsofJoinNode]] (and nothing else)
  * into [[GraftAsofExec]].
  */
object GraftAsofStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, lt, rk, rt, p) =>
      GraftAsofExec(lk, lt, rk, rt, p, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

object AsofExec {

  /** Idempotently install the strategy on the session. */
  def install(spark: SparkSession): Unit =
    spark.experimental.synchronized {
      val cur = spark.experimental.extraStrategies
      if (!cur.contains(GraftAsofStrategy))
        spark.experimental.extraStrategies = cur :+ GraftAsofStrategy
    }

  /** Backward as-of join through the custom operator — same signature
    * and semantics as [[graft.ext.AsofJoin.asofBackward]].
    */
  def asofBackward(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    val clash = payload.filter(left.columns.contains)
    require(clash.isEmpty,
      s"payload columns collide with left columns: ${clash.mkString(", ")}")
    val spark = left.sparkSession
    install(spark)
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output.map(_.name)}"))
    require(attr(lp, leftKey).dataType == attr(rp, rightKey).dataType,
      "key types must match")
    require(attr(lp, leftTime).dataType == attr(rp, rightTime).dataType,
      "time types must match")
    org.apache.spark.sql.graft.PlanBridge.ofRows(spark,
      AsofJoinNode(lp, rp, attr(lp, leftKey), attr(lp, leftTime),
        attr(rp, rightKey), attr(rp, rightTime), payload.map(attr(rp, _))))
  }
}
