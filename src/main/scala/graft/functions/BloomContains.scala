package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, PlanExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_contains(filter_binary, xxhash64_value)` → BOOLEAN.
  *
  * Graft-native replacement for Spark's internal
  * `BloomFilterMightContain` (r15): that expression's generated code
  * casts the probe value with a bare `(Long)$value`, and when the probe
  * side is FOLDABLE (a literal key, the c18 spec shape) constant
  * folding leaves a negative long literal there — janino parses
  * `(Long)-123L` as `java.lang.Long` MINUS `123L` ("Expression
  * java.lang.Long is not an rvalue") and the whole projection falls
  * back to interpreter mode, a silent 10-40× row-path tax wherever the
  * shape recurs. `mightContainLong` takes a primitive long, so the cast
  * was never needed; this version simply omits it.
  *
  * Contract matches the Spark original: the filter side must be a
  * constant (or scalar-subquery) BINARY — it is deserialized ONCE per
  * plan and shipped as a codegen reference, never per row; null filter
  * or null probe → null. */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_bloom_contains"
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType)
        if left.foldable || left.exists(_.isInstanceOf[PlanExpression[_]]) =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a constant or scalar-subquery filter")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (binary, bigint), got ($l, $r)")
    }

  // deserialized once per plan, at first use AFTER subquery execution
  // (doGenCode/eval run post-substitution — the Spark original's timing)
  @transient private lazy val filter: BloomFilter = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    if (bytes == null) null
    else BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def eval(input: InternalRow): Any = {
    if (filter == null) null
    else {
      val v = right.eval(input)
      if (v == null) null else filter.mightContainLong(v.asInstanceOf[Long])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (filter == null) {
      ev.copy(code = code"""
        boolean ${ev.isNull} = true;
        boolean ${ev.value} = false;""")
    } else {
      val bf = ctx.addReferenceObj("graftBloomFilter", filter,
        classOf[BloomFilter].getName)
      val valueGen = right.genCode(ctx)
      // NO cast on the probe: mightContainLong takes a primitive long,
      // and a (Long) cast in front of a folded negative literal is the
      // exact janino mis-parse this class exists to avoid
      ev.copy(code = code"""
        ${valueGen.code}
        boolean ${ev.isNull} = ${valueGen.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = $bf.mightContainLong(${valueGen.value});
        }""")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
