package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mergeable KLL quantile sketches as first-class column values — the
  * quantile member of the persistable-sketch-artifact family (HLL
  * distinct counts: `hll_sketch_agg`; frequent items:
  * `approx_top_k_accumulate`; quantiles: this file, since Spark ships
  * no re-mergeable quantile state — `approx_percentile` only ever
  * evaluates in place).
  *
  * Posture notes shared by all three expressions:
  *  - per-group state is O(k log n) regardless of the value domain
  *    (vs exact percentile's value→count map);
  *  - merge is the sketch-native union: associative + commutative, so
  *    partial aggregation composes across any partitioning, and a
  *    persisted per-(group, day) sketch table re-rolls to any date
  *    range without touching raw data;
  *  - estimates carry a NORMALIZED RANK error (~1.65% at k=200, 99%
  *    conf), not a value error — specs must assert in the rank domain
  *    (the q38 discipline). KLL compaction flips a random coin, so
  *    results are rows-only gated (bounded, not bit-reproducible).
  */
private[graft] trait KllAggBase extends BinaryLike[Expression] {
  self: TypedImperativeAggregate[KllDoublesSketch] =>
  def child: Expression
  def kExpr: Expression

  protected lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case other => throw new IllegalArgumentException(s"k must be int, got $other")
  }
  override def left: Expression = child
  override def right: Expression = kExpr
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  protected def checkK(childOk: Boolean, childWant: String): TypeCheckResult =
    if (!childOk)
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects $childWant, got ${child.dataType}")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must be an int literal")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)
  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }
  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** Aggregate a double column into a serialized KLL sketch (binary). */
case class KllSketchAgg(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with KllAggBase {

  override def prettyName: String = "graft_kll_agg"
  override def checkInputDataTypes(): TypeCheckResult =
    checkK(child.dataType == DoubleType, "a double column")

  override def update(buf: KllDoublesSketch, row: InternalRow): KllDoublesSketch = {
    val v = child.eval(row)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }
  override def withNewMutableAggBufferOffset(n: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): KllSketchAgg =
    copy(child = l, kExpr = r)
}

/** Union serialized KLL sketches (binary column) into one sketch. */
case class KllMergeAgg(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with KllAggBase {

  override def prettyName: String = "graft_kll_merge"
  override def checkInputDataTypes(): TypeCheckResult =
    checkK(child.dataType == BinaryType, "a binary (serialized KLL) column")

  override def update(buf: KllDoublesSketch, row: InternalRow): KllDoublesSketch = {
    val v = child.eval(row)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }
  override def withNewMutableAggBufferOffset(n: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): KllMergeAgg =
    copy(child = l, kExpr = r)
}

/** Quantile estimates from a serialized sketch: `graft_kll_quantiles(sk,
  * array(0.5, 0.9, …))` → array<double>. Evaluates once per GROUP row
  * (not per input row), so interpreted eval is fine — CodegenFallback. */
case class KllQuantiles(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "graft_kll_quantiles"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  // nullSafeEval returns null for an EMPTY sketch (an all-null input group
  // still serializes one), so nullability can't be inherited from the
  // non-nullable children — undeclared, the CodegenFallback non-nullable
  // path would skip the null check and corrupt the UnsafeRow.
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType &&
        (right.dataType match {
          case ArrayType(DoubleType, false) => true
          case _ => false
        })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (binary, array<double>), got ${left.dataType} / ${right.dataType}")

  override protected def nullSafeEval(sk: Any, ps: Any): Any = {
    val sketch = KllDoublesSketch.heapify(Memory.wrap(sk.asInstanceOf[Array[Byte]]))
    if (sketch.isEmpty) null
    else {
      val ranks = ps.asInstanceOf[ArrayData].toDoubleArray()
      new GenericArrayData(
        sketch.getQuantiles(ranks, QuantileSearchCriteria.INCLUSIVE))
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): KllQuantiles =
    copy(left = l, right = r)
}
