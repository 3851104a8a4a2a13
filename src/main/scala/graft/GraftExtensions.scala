package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, KllMergeAgg, KllQuantiles, KllSketchAgg, MinHashSignature, RollingFingerprint, SimHash, SortedIntersectCount}

/** Spark extensions entry point: lets any session pick up graft's native
  * expressions at build time —
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * (Sessions built by graft itself get the same functions via
  * `Tables.tune`, which registers post-hoc; this class is for sessions
  * graft does not construct, e.g. spark-submit / Thrift server users
  * calling `graft_dot` from SQL.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_intersect_n"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "graft_intersect_n"),
      (args: Seq[Expression]) => SortedIntersectCount(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash64"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash64"),
      (args: Seq[Expression]) => MinHashSignature(args(0))))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash].getName, "graft_simhash64"),
      (args: Seq[Expression]) => SimHash(args(0))))
    ext.injectFunction((
      new FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[RollingFingerprint].getName, "graft_fingerprint"),
      (args: Seq[Expression]) => RollingFingerprint(args(0))))
    ext.injectFunction((
      new FunctionIdentifier("graft_kll_agg"),
      new ExpressionInfo(classOf[KllSketchAgg].getName, "graft_kll_agg"),
      (args: Seq[Expression]) => KllSketchAgg(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_kll_merge"),
      new ExpressionInfo(classOf[KllMergeAgg].getName, "graft_kll_merge"),
      (args: Seq[Expression]) => KllMergeAgg(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_kll_quantiles"),
      new ExpressionInfo(classOf[KllQuantiles].getName, "graft_kll_quantiles"),
      (args: Seq[Expression]) => KllQuantiles(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_bloom_contains"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (args: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          args(0), args(1), args(2))))
    // HOF dot-product → native graft_dot rewrite (semantics-guarded)
    ext.injectOptimizerRule(_ => graft.plans.NativeVectorRewrite)
    // whole-operator as-of join: logical node → sorted-merge SparkPlan
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
