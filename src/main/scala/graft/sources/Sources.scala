package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Ingestion and output: schema-checked readers, partitioned writers.
  *
  * Scale posture: readers force an explicit schema (inference is a full
  * extra pass over 100 TB); writers partition by low-cardinality keys so
  * downstream scans prune, and sort within partitions so parquet
  * min/max row-group stats actually cut I/O.
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** CSV with an explicit schema — never schema-inference at scale. */
  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(path)

  /** JSON-lines with an explicit schema. */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC with an explicit schema. ORC carries min/max/bloom statistics
    * like parquet, and Spark pushes filters into the stripe reader — the
    * pruning spec asserts PushedFilters lands on the ORC scan. */
  def orc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Plain ORC write (overwrite). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Avro with an explicit schema. Avro is Spark's EXTERNAL module
    * (spark-avro) — callers on clusters without it get a clear error at
    * plan time; [[avroAvailable]] lets pipelines fall back (the round-trip
    * spec self-cancels where the connector jar is absent). */
  def avro(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).format("avro").load(path)

  /** Plain Avro write (overwrite); requires the spark-avro module. */
  def writeAvro(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").format("avro").save(path)

  /** True when the spark-avro data source is registered. Probes Spark's
    * own provider lookup (a bare Class.forName is wrong here: other Spark
    * modules bundle avro serialization classes without registering the
    * data source). */
  def avroAvailable(spark: SparkSession): Boolean =
    try {
      org.apache.spark.sql.execution.datasources.DataSource
        .lookupDataSource("avro", spark.sessionState.conf)
      true
    } catch { case _: Exception => false }

  /** Partitioned JDBC read — the parallel-ingest form: `numPartitions`
    * concurrent range queries over `[lowerBound, upperBound)` of a
    * numeric `partitionColumn`. A bare single-connection JDBC read
    * serializes a whole table through one executor — never acceptable
    * for bulk ingest; bounds come from the source's own
    * min/max(partitionColumn), fetched once. Filters and column
    * pruning push into the generated SQL (JDBCRelation pushdown). */
  def jdbc(spark: SparkSession, url: String, table: String,
           partitionColumn: String, lowerBound: Long, upperBound: Long,
           numPartitions: Int,
           props: java.util.Properties = new java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, props)

  /** Single-partition JDBC read — ONLY for genuinely small tables
    * (dimension/config lookups); see [[jdbc]] for bulk ingest. */
  def jdbcTable(spark: SparkSession, url: String, table: String,
                props: java.util.Properties = new java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Small-files compaction: rewrite a parquet dataset into
    * ~`targetMB`-sized files at `outPath`. Streaming sinks and
    * fine-grained partitioned writes accumulate thousands of small
    * files; at 100 TB the file-listing and per-file open costs dominate
    * scans until compaction runs. Output file count is computed from the
    * actual on-disk size, not row counts (row width varies). Writes to a
    * NEW path — the atomic swap (rename/catalog repoint) is the
    * caller's, so a failed compaction never corrupts the live dataset. */
  def compactTo(spark: SparkSession, inPath: String, outPath: String,
                targetMB: Int = 512): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inPath), spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(inPath)).getLength
    val nFiles = math.max(1L, bytes / (targetMB.toLong << 20) +
      (if (bytes % (targetMB.toLong << 20) == 0) 0 else 1)).toInt
    spark.read.parquet(inPath).repartition(nFiles)
      .write.mode("overwrite").parquet(outPath)
  }

  /** PERMISSIVE JSON-lines read with a corrupt-record column: malformed
    * lines become DATA — all schema fields null, the raw line preserved
    * in `_corrupt_record` for the quarantine queue — instead of killing
    * a multi-hour ingest (FAILFAST) or silently vanishing (DROPMALFORMED).
    * At crawl scale some malformed input is a certainty; the pipeline
    * posture is route-and-count, not crash. */
  def jsonLinesPermissive(spark: SparkSession, path: String,
                          schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Schema-evolution read: union parquet batches whose schemas
    * DIVERGED over time (columns added by later writers) into one
    * frame — `mergeSchema` reconciles by NAME across every footer, and
    * rows from batches that predate a column null-fill it. This is the
    * lakehouse posture: a growing schema must never force a rewrite of
    * petabytes of old files, and a reader pinned to one batch's schema
    * silently drops the new columns. (mergeSchema footer-merging costs
    * a pass over file metadata — at very large file counts, prefer a
    * table format's tracked schema; within a parquet-directory world
    * this is the correct tool.) */
  def readEvolved(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)

  /** Streaming parquet-directory source (schema-explicit — streaming
    * sources cannot infer, and shouldn't at scale anyway; file listing
    * is incremental per micro-batch). Feed into any StreamOps transform
    * and a checkpointed writeStream sink for the live half of a
    * backfill+live pipeline. */
  def streamParquet(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Partitioned, stats-friendly parquet write: partition columns prune
    * whole directories; sortWithinPartitions orders row groups so
    * min/max statistics make selective scans skip pages. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val sorted =
      if (sortCols.nonEmpty)
        df.sortWithinPartitions((partitionCols ++ sortCols).map(df.col): _*)
      else df
    sorted.write
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)
  }

  /** Training-shard write: the release layout — documents land in
    * `shard=N/` directories keyed by the deterministic c11 hash (stable
    * under corpus growth and re-runs: a doc's shard never changes), one
    * partition directory per shard so any shard subset scans with full
    * pruning. Pair with Curation.shardManifest over the read-back
    * dataset for the release manifest + placement check. */
  def writeSharded(df: DataFrame, path: String, nShards: Int = 8,
                   seed: Long = 104729L): Unit =
    df.withColumn("shard",
        graft.operators.Curation.shardIdCol(nShards, seed))
      .write.partitionBy("shard").mode("overwrite").parquet(path)

  /** Plain single-dataset write (overwrite). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Bucketed + sorted table write: both sides of a recurring fact-fact
    * join written with the same bucketing never shuffle again — the join
    * runs bucket-local (asserted in BucketingSpec: zero Exchange nodes).
    * This is the 100 TB answer to repeated big-big joins; bucket count
    * should be a multiple of the cluster's parallelism. Requires a
    * catalog (`saveAsTable`) — plain parquet paths can't carry bucket
    * metadata. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Bit-interleave of two `bits`-wide bucket indices (x even positions,
    * y odd) — the Morton/Z curve. Pure shift/mask column ops: 4·bits
    * codegen'd terms, no UDF. */
  private def zInterleave(bx: org.apache.spark.sql.Column,
                          by: org.apache.spark.sql.Column, bits: Int) = {
    import org.apache.spark.sql.functions.{lit, shiftleft, shiftrightunsigned}
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(bx, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftrightunsigned(by, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Equal-mass bucket index in [0, #bounds]: how many quantile
    * boundaries the value exceeds. Equal-WIDTH bucketing (width_bucket
    * over min/max) was measured collapsing on the skewed test columns —
    * most rows land in a few low buckets and the curve degenerates to a
    * one-dimensional sort — so quantile bucketing is the only default
    * that keeps the z-cell occupancy uniform regardless of the value
    * distribution. The fold is 2^bits − 1 compares per row on the
    * one-time write path; a codegen binary-search expression is the
    * drop-in upgrade if that ever shows up in a profile. */
  private def quantileBucket(c: org.apache.spark.sql.Column,
                             bounds: Array[Double]) = {
    import org.apache.spark.sql.functions.{aggregate, lit, typedLit, when}
    aggregate(typedLit(bounds.toSeq), lit(0L),
      (acc, b) => acc + when(c.cast("double") > b, 1L).otherwise(0L))
  }

  /** Z-ordered parquet write: cluster rows along the Morton curve of two
    * columns so EVERY file's min/max footer stats are tight in BOTH
    * dimensions at once — a single-column sort gives skipping on one
    * dimension and leaves the other spanning its full domain in every
    * file. Skipping happens at parquet row-group granularity via the
    * standard stats filter (`PushedFilters` on the scan); with files of
    * ~one row group, the per-file bounding box IS the pruning unit
    * (BucketingSpec measures exactly that). This is the data-layout
    * lever at 100 TB: a selective two-dimensional predicate reads the
    * few files whose z-range intersects the query rectangle instead of
    * the whole table.
    *
    * One extra pass over the input (two approx-quantile aggs, GK sketch
    * — bounded memory) computes equal-mass bucket boundaries per
    * dimension (see [[quantileBucket]] for why not equal-width); the
    * z-value itself is pure bit math, and `repartitionByRange` on it
    * both balances file sizes and makes each file a contiguous
    * z-slice. */
  def writeZOrdered(df: DataFrame, path: String, colX: String, colY: String,
                    bits: Int = 6, numFiles: Int = 0): Unit = {
    val z = zOrderCol(df, colX, colY, bits)
    val ranged = if (numFiles > 0) df.repartitionByRange(numFiles, z)
                 else df.repartitionByRange(z)
    ranged.sortWithinPartitions(z).write.mode("overwrite").parquet(path)
  }

  /** The Morton-curve clustering key for `df`'s (colX, colY) — the
    * equal-mass bucketing + bit-interleave shared by [[writeZOrdered]]
    * and TxTable's OPTIMIZE-ZORDER compaction. Runs two approx-quantile
    * aggs over `df` (GK sketch, bounded memory) to fit the per-dimension
    * boundaries; the returned Column is pure shift/mask arithmetic. */
  def zOrderCol(df: DataFrame, colX: String, colY: String,
                bits: Int = 6): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.col
    require(bits >= 1 && bits <= 12, "bits per dimension must be in [1, 12]")
    val n = 1 << bits
    val probs = (1 until n).map(_.toDouble / n).toArray
    val Seq(bx, by) = Seq(colX, colY).map { cn =>
      quantileBucket(col(cn), df.stat.approxQuantile(cn, probs, 0.001))
    }
    zInterleave(bx, by, bits)
  }

  /** Key-based upsert (MERGE): rows from `updates` replace same-key rows
    * in `current`; unmatched rows from both sides survive. One shuffle
    * on the key (or zero if both sides are bucketed on it); at table
    * scale this is the compaction step of an incremental pipeline. */
  /** Apply an ordered CDC changelog (I/U/D rows with a sequence column)
    * onto a snapshot — the SCD1 load. Per key only the LATEST change
    * applies (row_number over seq desc — a multi-change key collapses
    * before touching the snapshot, so the join carries one row per
    * changed key no matter how chatty the log); 'D' deletes, 'I'/'U'
    * replace the full row, untouched keys pass through. One shuffle of
    * the (skinny) changelog + one key-partitioned full-outer join; the
    * snapshot is never windowed or re-sorted. Insert/update-of-absent
    * land as inserts of the change row (idempotent replay semantics:
    * the log wins); delete-of-absent is a no-op. */
  def applyCdc(snapshot: DataFrame, changes: DataFrame, key: String,
               seqCol: String = "seq", opCol: String = "op"): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, row_number, when}
    import org.apache.spark.sql.expressions.Window
    val cols = snapshot.columns.filter(_ != key)
    val latest = changes
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(key)).orderBy(col(seqCol).desc)))
      .filter(col("_rn") === 1)
    val snap = snapshot.select(snapshot.columns.map(c =>
      snapshot.col(c).as(if (c == key) c else s"cur_$c")): _*)
    val chg = latest.select(col(key) +: col(opCol).as("_op") +:
      cols.map(c => latest.col(c).as(s"chg_$c")): _*)
    snap.join(chg, Seq(key), "full_outer")
      .filter(col("_op").isNull || col("_op") =!= lit("D"))
      .select(col(key) +: cols.map(c =>
        when(col("_op").isNotNull, col(s"chg_$c"))
          .otherwise(col(s"cur_$c")).as(c)): _*)
  }

  def upsert(current: DataFrame, updates: DataFrame, key: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, when}
    val cur = current.select(current.columns.map(c =>
      current.col(c).as(if (c == key) c else s"cur_$c")): _*)
    // row-presence marker (not coalesce): an update row carrying a NULL
    // column must still replace the current value with NULL
    val upd = updates.select(updates.columns.map(c =>
      updates.col(c).as(if (c == key) c else s"upd_$c")): _*)
      .withColumn("_upd_present", lit(1))
    val cols = current.columns.filter(_ != key)
    cur.join(upd, Seq(key), "full_outer")
      .select(col(key) +: cols.map(c =>
        when(col("_upd_present").isNotNull, col(s"upd_$c"))
          .otherwise(col(s"cur_$c")).as(c)): _*)
  }
}
