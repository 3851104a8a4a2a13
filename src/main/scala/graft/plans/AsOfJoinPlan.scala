package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Whole-operator as-of join: the custom LogicalPlan → SparkStrategy →
  * SparkPlan tier, for the one time-series operator whose natural
  * physical form — a single co-partitioned, co-sorted MERGE — none of
  * Spark's built-in join operators express directly. (The library's
  * composition form, TimeJoins.asofJoin, encodes the same linear pass as
  * a union + carry-forward window; this node expresses it as what it is:
  * each LEFT row joins the LAST RIGHT row of the same key with
  * right-time ≤ left-time, in one pass over both sorted sides.)
  *
  * Semantics: output = every left row ++ the right side's payload
  * columns (right.output minus its key/time), null-padded when no right
  * row qualifies. Key and time expressions must be LongType and non-null
  * on the right side; a null left key/time row emits with null payload.
  * Ties on right time keep the LATER row in (time, payload-input) order,
  * i.e. the last one the sorted merge sees — callers wanting a
  * deterministic tie-break include a tiebreaker in the time value
  * (epoch-seconds × ids are already unique in the gated query).
  *
  * Scale shape: EnsureRequirements plans one hash exchange + sort per
  * side (key clustering, (key, time) ordering) — exactly the shuffles
  * any correct formulation needs — and the merge itself is streaming,
  * O(1) state (one held payload per current key), no windowed buffering,
  * no per-row probe. At 100 TB this is the classic sorted as-of merge
  * every time-series store implements.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                    leftKey: Expression, leftTime: Expression,
                    rightKey: Expression, rightTime: Expression)
    extends BinaryNode {
  require(Seq(leftKey, leftTime, rightKey, rightTime)
      .forall(e => !e.resolved || e.dataType == LongType),
    "as-of key/time expressions must be LongType (cast upstream)")

  /** Right payload = right columns minus its key/time, made nullable
    * (exprIds preserved, like an outer join's stream side). */
  def rightPayload: Seq[Attribute] = right.output.filterNot(a =>
    rightKey.references.contains(a) || rightTime.references.contains(a))

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner rule mapping the logical [[AsOfJoin]] to its physical merge. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, lt, rk, rt) =>
      AsOfJoinExec(lk, lt, rk, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical sorted-merge as-of join. Requires both children clustered on
  * their key and sorted by (key, time) — EnsureRequirements inserts the
  * exchanges/sorts and co-partitions the sides; the merge then runs
  * zipped partition pairs with one pass and one held payload row. */
case class AsOfJoinExec(leftKey: Expression, leftTime: Expression,
                        rightKey: Expression, rightTime: Expression,
                        left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  private def rightPayload: Seq[Attribute] = right.output.filterNot(a =>
    rightKey.references.contains(a) || rightTime.references.contains(a))

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  // one-to-one on the left side: partitioning and ordering pass through
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val payload = rightPayload
    // the result projection's INPUT schema must mark the payload slots
    // nullable (matching the null-padded GenericInternalRow): binding
    // against the right child's original non-nullable attributes would
    // let codegen skip the null check and emit 0/garbage instead of NULL
    val payloadNullable = payload.map(_.withNullability(true))
    val lSchema = left.output
    val rSchema = right.output
    val lKeyExpr = leftKey; val lTimeExpr = leftTime
    val rKeyExpr = rightKey; val rTimeExpr = rightTime
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lkt = UnsafeProjection.create(Seq(lKeyExpr, lTimeExpr), lSchema)
      val rkt = UnsafeProjection.create(Seq(rKeyExpr, rTimeExpr), rSchema)
      val payloadProj = UnsafeProjection.create(payload, rSchema)
      val resultProj = UnsafeProjection.create(outAttrs, lSchema ++ payloadNullable)
      val joined = new JoinedRow
      val nulls = new GenericInternalRow(payload.length)

      // one row of right-side lookahead + the held payload for the
      // current key — the operator's entire state
      var rRow: InternalRow = null
      var rK = 0L; var rT = 0L
      def advance(): Unit = {
        rRow = null
        while (rRow == null && rIter.hasNext) {
          val n = rIter.next()
          val kt = rkt(n)
          // right rows with null key/time can never qualify — skip
          if (!kt.isNullAt(0) && !kt.isNullAt(1)) {
            rK = kt.getLong(0); rT = kt.getLong(1); rRow = n
          }
        }
      }
      advance()
      var heldKey = 0L
      var held: InternalRow = null
      lIter.map { l =>
        val kt = lkt(l)
        if (kt.isNullAt(0) || kt.isNullAt(1)) resultProj(joined(l, nulls))
        else {
          val k = kt.getLong(0); val t = kt.getLong(1)
          // consume every right row at or before (k, t); later left rows
          // only ever need rows at-or-after this point (sorted sides)
          while (rRow != null && (rK < k || (rK == k && rT <= t))) {
            if (rK == k) { held = payloadProj(rRow).copy(); heldKey = k }
            advance()
          }
          val p = if (held != null && heldKey == k) held else nulls
          resultProj(joined(l, p))
        }
      }
    }
  }
}
