package org.apache.spark.sql.graftx

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
import graft.functions.{DotProduct, KllMergeAgg, KllQuantiles, KllSketchAgg, MinHashSignature, RollingFingerprint, SimHash, SortedIntersectCount}

/** Session-registry bridge (lives under org.apache.spark.sql to reach the
  * private[sql] session internals — the standard library-extension
  * pattern, cf. Qbeast's DatasetFactory / Spark's own sql package object).
  */
object GraftFunctions {

  /** Idempotently registers graft's native expressions as temp functions
    * so Column code can reach them via `functions.call_function`. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[ClassicSession].sessionState.functionRegistry
    registry.createOrReplaceTempFunction("graft_dot",
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(args(0), args(1)),
      "built-in")
    registry.createOrReplaceTempFunction("graft_intersect_n",
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SortedIntersectCount(args(0), args(1)),
      "built-in")
    registry.createOrReplaceTempFunction("graft_minhash64",
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHashSignature(args(0)),
      "built-in")
    registry.createOrReplaceTempFunction("graft_simhash64",
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash(args(0)),
      "built-in")
    registry.createOrReplaceTempFunction("graft_fingerprint",
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RollingFingerprint(args(0)),
      "built-in")
    // Spark's own bloom-probe expression (the one InjectRuntimeFilter
    // plants): not SQL-registered upstream because runtime filtering
    // inserts it directly — graft exposes it for explicit
    // build-once/probe-many membership gates (Curation.bloomGate).
    // args: (bloom filter binary — constant/foldable, probed long hash)
    registry.createOrReplaceTempFunction("graft_bloom_contains",
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(args(0), args(1)),
      "built-in")
    // build side of the same pair (TypedImperativeAggregate, mergeable):
    // upstream keeps it on the internal-only registry, same reason as the
    // probe. args: (long hash column, estimatedNumItems, numBits)
    // mergeable KLL quantile sketches (graft-native TypedImperativeAggregate
    // pair + estimator — Spark has no re-mergeable quantile state)
    registry.createOrReplaceTempFunction("graft_kll_agg",
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        KllSketchAgg(args(0), args(1)),
      "built-in")
    registry.createOrReplaceTempFunction("graft_kll_merge",
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        KllMergeAgg(args(0), args(1)),
      "built-in")
    registry.createOrReplaceTempFunction("graft_kll_quantiles",
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        KllQuantiles(args(0), args(1)),
      "built-in")
    registry.createOrReplaceTempFunction("graft_bloom_agg",
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          args(0), args(1), args(2)),
      "built-in")
  }
}
