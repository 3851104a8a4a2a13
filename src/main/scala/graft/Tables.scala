package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loads the star-schema test tables from a scale-factor directory.
  *
  * All operators in graft take DataFrames; this is the only place that
  * knows about paths. At cluster scale the same operators run against
  * catalog tables — nothing else changes.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // Parquet TIMESTAMP(NANOS) isn't a Spark type: with nanosAsLong (set in
    // tune) it arrives as raw nanos — normalize to a microsecond timestamp.
    df.schema.fields.find(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType)
      .map(_ => df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)")))
      .getOrElse(df)
  }

  /** Session defaults tuned for the local[32] harness; on a real
    * cluster only shuffle.partitions changes (AQE coalesces anyway).
    */
  def tune(spark: SparkSession): SparkSession = {
    val c = spark.conf
    c.set("spark.sql.adaptive.enabled", "true")
    c.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    c.set("spark.sql.adaptive.skewJoin.enabled", "true")
    c.set("spark.sql.session.timeZone", "UTC")
    c.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The synthetic tables have carried timestamps as INT64 TIMESTAMP(NANOS)
    // (handled via nanosAsLong + the ts re-cast in load) and, since the
    // 2026-08-13 regeneration, as UNTAGGED TIMESTAMP(MICROS). Untagged micros
    // infer TIMESTAMP_NTZ on Spark 4 — a type whose collected rows are
    // LocalDateTime (breaking Row.getTimestamp consumers) and whose watermark
    // arithmetic diverges from the operators' assumptions. With the session
    // timezone pinned to UTC, classic TIMESTAMP reads the same wall-clock
    // values the file stores and DuckDB's naive reads agree — so disable the
    // inference and keep one timestamp type across every source vintage.
    c.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    // Constraint propagation infers isnotnull(...) filters by INLINING the
    // full defining expression of every referenced alias. On expression-
    // heavy pipelines (shingling, hashing) those inferred per-row filters
    // re-evaluate the pipeline — measured 11× on the near-dup benchmark.
    // The useful inferred filters here are join-key isnotnulls, which the
    // operators already state explicitly.
    c.set("spark.sql.constraintPropagation.enabled", "false")
    org.apache.spark.sql.graftx.GraftFunctions.register(spark)
    // HOF dot-product → native graft_dot. APPEND (idempotently) rather
    // than assign: tune() must not clobber optimizer rules the caller
    // registered on the session. (GraftExtensions-built sessions get the
    // same rule via injectOptimizerRule.)
    if (!spark.experimental.extraOptimizations.contains(graft.plans.NativeVectorRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.NativeVectorRewrite
    // whole-operator as-of join (same append-idempotently discipline)
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    spark
  }
}
