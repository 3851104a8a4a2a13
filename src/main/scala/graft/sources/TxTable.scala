package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Minimal log-structured transactional table — the Delta-protocol
  * pattern from the public literature (Armbrust et al., "Delta Lake:
  * High-Performance ACID Table Storage over Cloud Object Stores",
  * VLDB 2020): immutable parquet data files plus an ordered log of
  * versioned commit records; a snapshot is the replay of adds minus
  * removes up to a version. This is the storage half the DataFrame-level
  * merges (q24 upsert, q44/st11 CDC) compose onto — the state tables a
  * 100 TB pipeline keeps (signature tables, cluster assignments, sketch
  * rollups) need exactly this: atomic multi-file commits, readers never
  * seeing half a write, MERGE that rewrites only the files it must, and
  * compaction as just another commit.
  *
  * Commit protocol: data files are written (and fsync'd by the
  * filesystem) BEFORE the log record; the log record is created with an
  * atomic create-if-absent, so two concurrent committers race on the
  * version number and exactly one wins (the loser re-reads the snapshot
  * and retries — optimistic concurrency, the paper's §3.2). On a POSIX
  * filesystem `Files.createFile` provides the put-if-absent primitive;
  * an object store deployment substitutes its conditional-put (the
  * paper's LogStore discussion). Readers list the log directory and
  * replay — no lock, no coordination.
  *
  * File-level pruning: every committed data file carries min/max stats
  * of the declared key column in its log record, so MERGE touches only
  * files whose key range intersects the updates (everything else
  * carries over by not being removed) and point reads can skip files —
  * the property raw parquet directories lack and the reason state
  * tables at scale need a log-structured format.
  *
  * JSON is written/parsed with json4s (ships with Spark). Log records
  * are tiny (file names + stats), never data. */
object TxTable {

  import org.json4s._
  import org.json4s.jackson.{JsonMethods, Serialization}
  private implicit val fmts: Formats = DefaultFormats

  case class FileEntry(name: String, rows: Long, kmin: Long, kmax: Long)
  case class Commit(version: Long, key: String,
                    adds: Seq[FileEntry], removes: Seq[String])

  private def logDir(root: String): Path = Paths.get(root, "_graft_log")
  private def dataDir(root: String): Path = Paths.get(root, "data")
  private def logName(v: Long): String = f"v$v%010d.json"

  /** All commits in version order (the snapshot replay input). */
  private def commits(root: String): Seq[Commit] = {
    val d = logDir(root)
    if (!Files.isDirectory(d)) return Seq.empty
    import scala.jdk.CollectionConverters._
    val listing = Files.list(d)
    val files = try listing.iterator().asScala.toSeq finally listing.close()
    files.filter(_.getFileName.toString.matches("v\\d{10}\\.json"))
      .sortBy(_.getFileName.toString)
      .map(p => Serialization.read[Commit](
        new String(Files.readAllBytes(p), java.nio.charset.StandardCharsets.UTF_8)))
  }

  /** Live file entries as of `asOf` (inclusive; None = latest). */
  def snapshot(root: String, asOf: Option[Long] = None): Seq[FileEntry] = {
    val live = scala.collection.mutable.LinkedHashMap.empty[String, FileEntry]
    commits(root).filter(c => asOf.forall(c.version <= _)).foreach { c =>
      c.removes.foreach(live.remove)
      c.adds.foreach(a => live.update(a.name, a))
    }
    live.values.toSeq
  }

  def currentVersion(root: String): Long =
    commits(root).lastOption.map(_.version).getOrElse(0L)

  /** Write `df` as data files under the table and return their log
    * entries (with per-file key min/max from one stats pass). The files
    * are INVISIBLE until a commit references them — the crash-safety
    * property: an orphaned write is garbage, never a torn table. */
  private def writeFiles(spark: SparkSession, df: DataFrame, root: String,
                         key: String, tag: String): Seq[FileEntry] = {
    val tmp = Files.createTempDirectory(Paths.get(root), s"stage-$tag-")
    try {
      df.write.mode("overwrite").parquet(tmp.toString)
      import scala.jdk.CollectionConverters._
      val listing = Files.list(tmp)
      val parts = try listing.iterator().asScala.toSeq finally listing.close()
      // a random component makes names collision-free across CONCURRENT
      // writers (two committers at the same guessed version must never
      // rename onto each other's bytes — POSIX rename replaces silently);
      // names are opaque, the log is the identity
      val nonce = java.util.UUID.randomUUID().toString.take(8)
      val moved = parts.filter(_.getFileName.toString.startsWith("part-"))
        .sortBy(_.getFileName.toString).zipWithIndex.map { case (p, i) =>
          val dest = dataDir(root).resolve(s"$tag-$nonce-$i.parquet")
          Files.createDirectories(dest.getParent)
          Files.move(p, dest, StandardCopyOption.ATOMIC_MOVE)
          dest
        }
      if (moved.isEmpty) return Seq.empty
      // one pass over the new files for per-file stats (the log never
      // stores data, only names + ranges)
      // non-integral keys (strings, composites) cast to null: such a
      // file records the FULL key range, so pruning degrades to
      // touch-this-file-always instead of silently skipping it (the
      // degrade-never-miss posture a MERGE must have)
      val stats = spark.read.parquet(moved.map(_.toString): _*)
        .groupBy(input_file_name().as("f"))
        .agg(count(lit(1)).as("rows"),
          min(expr(s"try_cast(`$key` AS BIGINT)")).as("kmin"),
          max(expr(s"try_cast(`$key` AS BIGINT)")).as("kmax"))
        .collect()
        .map { r =>
          val kmin = if (r.isNullAt(2)) Long.MinValue else r.getLong(2)
          val kmax = if (r.isNullAt(3)) Long.MaxValue else r.getLong(3)
          (r.getString(0), (r.getLong(1), kmin, kmax))
        }
        .toMap
      moved.map { p =>
        val (rows, kmin, kmax) = stats.collectFirst {
          case (f, s) if f.endsWith(p.getFileName.toString) => s
        }.getOrElse((0L, 0L, -1L))
        FileEntry(p.getFileName.toString, rows, kmin, kmax)
      }.filter(_.rows > 0)
    } finally {
      // remove the now-empty staging dir (files were moved out)
      import scala.jdk.CollectionConverters._
      val l = Files.list(tmp)
      val rest = try l.iterator().asScala.toSeq finally l.close()
      rest.foreach(Files.deleteIfExists(_))
      Files.deleteIfExists(tmp)
    }
  }

  /** Atomic create-if-absent commit AT a specific version; false when
    * another committer won that version. The caller (the OCC loop in
    * [[occRetry]]) must then RE-DERIVE its diff from the new snapshot —
    * blindly re-stamping a stale diff at the next version would re-add
    * rewritten files whose originals a concurrent commit already
    * replaced (a lost-update/duplicate-row corruption, caught in the
    * r13 self-review). Orphaned data files from the losing attempt stay
    * unreferenced — garbage for vacuum, never visible. */
  private def tryCommit(root: String, key: String, v: Long,
                        adds: Seq[FileEntry], removes: Seq[String]): Boolean = {
    Files.createDirectories(logDir(root))
    val rec = Serialization.write(Commit(v, key, adds, removes))
    try {
      Files.write(logDir(root).resolve(logName(v)),
        rec.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE_NEW)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    }
  }

  /** The optimistic-concurrency loop: snapshot → derive → attempt the
    * next version; on collision, re-derive from the NEW snapshot. */
  private def occRetry(root: String, maxAttempts: Int = 20)(
      attempt: Long => (Seq[FileEntry], Seq[String], String)): Long = {
    var tries = 0
    while (tries < maxAttempts) {
      val v = currentVersion(root) + 1
      val (adds, removes, key) = attempt(v)
      if (tryCommit(root, key, v, adds, removes)) return v
      tries += 1
    }
    throw new IllegalStateException(
      s"TxTable at $root: lost the commit race $maxAttempts times")
  }

  /** Initialize (or fully replace) the table at `root` with `df`. */
  def create(spark: SparkSession, df: DataFrame, root: String,
             key: String): Long = {
    val r = Paths.get(root)
    if (Files.exists(r)) { // full replace: drop log + data
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(r)
      val files = try walk.iterator().asScala.toSeq.reverse finally walk.close()
      files.foreach(Files.deleteIfExists(_))
    }
    Files.createDirectories(dataDir(root))
    val adds = writeFiles(spark, df, root, key, "base")
    require(tryCommit(root, key, 1L, adds, Seq.empty),
      s"TxTable at $root: concurrent create detected")
    1L
  }

  /** Snapshot read (optionally time-traveled to `asOf`). Reads ONLY the
    * live files — uncommitted or removed files are invisible. */
  def read(spark: SparkSession, root: String,
           asOf: Option[Long] = None): DataFrame = {
    val files = snapshot(root, asOf)
    require(files.nonEmpty, s"TxTable at $root has no live files")
    spark.read.parquet(files.map(f =>
      dataDir(root).resolve(f.name).toString): _*)
  }

  /** Names of the live files whose key range intersects the update/
    * delete key set — a broadcast range join over the (small) file-range
    * table. Non-integral keys cast to null on the probe side, where a
    * range test can never match — any null probe key therefore degrades
    * to touch-ALL-files (a full rewrite is correct, a missed file is
    * not), matching the writer side's full-range stats for such keys. */
  private def touchedFileNames(spark: SparkSession, files: Seq[FileEntry],
                               updates: DataFrame, key: String): Set[String] = {
    import spark.implicits._
    val ks = updates.select(expr(s"try_cast(`$key` AS BIGINT)").as("k"))
      .distinct().localCheckpoint()
    if (ks.filter(col("k").isNull).limit(1).count() > 0)
      return files.map(_.name).toSet
    val ranges = files.map(f => (f.name, f.kmin, f.kmax))
      .toDF("name", "kmin", "kmax")
    ks.join(broadcast(ranges), col("k").between(col("kmin"), col("kmax")))
      .select(col("name")).distinct().as[String].collect().toSet
  }

  /** Storage-level MERGE (upsert by `key`): only files whose key range
    * intersects the update keys are read and rewritten; every other
    * file carries over untouched — the file-level pruning that makes a
    * merge on a 100 TB state table proportional to the touched keys,
    * not the table. One atomic commit swaps removed-for-rewritten. */
  def merge(spark: SparkSession, root: String, updates: DataFrame,
            key: String): Long = occRetry(root) { v =>
    val files = snapshot(root, None)
    val touchedSet = touchedFileNames(spark, files, updates, key)
    val touched = files.filter(f => touchedSet.contains(f.name))
    val base =
      if (touched.isEmpty) updates.limit(0)
      else spark.read.parquet(touched.map(f =>
        dataDir(root).resolve(f.name).toString): _*)
    // ALL updates enter the rewrite: matched keys replace rows read
    // from the touched files, unmatched keys are pure inserts
    val merged = Sources.upsert(base, updates, key)
    (writeFiles(spark, merged, root, key, f"$v%010d-merge"),
      touched.map(_.name), key)
  }

  /** Storage-level DELETE by key — the other half of a CDC sink: prune
    * to the files whose key range intersects the delete set, rewrite
    * them without those keys, one atomic commit. Delete-of-absent is a
    * no-op (idempotent replay, the applyCdc contract). */
  def deleteKeys(spark: SparkSession, root: String, keys: DataFrame,
                 key: String): Long = {
    if (touchedFileNames(spark, snapshot(root, None), keys, key).isEmpty)
      return currentVersion(root)   // delete-of-absent: no-op
    occRetry(root) { v =>
      val files = snapshot(root, None)
      val touchedSet = touchedFileNames(spark, files, keys, key)
      val touched = files.filter(f => touchedSet.contains(f.name))
      val base =
        if (touched.isEmpty) // raced to a no-op: commit an empty diff
          return currentVersion(root)
        else spark.read.parquet(touched.map(f =>
          dataDir(root).resolve(f.name).toString): _*)
      val remaining = base.join(keys.select(col(key)).distinct(),
        Seq(key), "left_anti")
      (writeFiles(spark, remaining, root, key, f"$v%010d-delete"),
        touched.map(_.name), key)
    }
  }

  /** Vacuum: physically delete data files that are no longer live in
    * ANY version newer than `keepVersions` back from the head — the
    * retention policy that bounds storage while keeping recent time
    * travel working. A file is deletable iff it is absent from the
    * live set of EVERY retained version (the head and the
    * `keepVersions` before it). Vacuum touches no log records, so the
    * version history stays intact — a time-travel read past the
    * horizon fails loudly on the missing file rather than lying.
    * Returns the deleted file names. */
  def vacuum(root: String, keepVersions: Int = 1): Seq[String] = {
    val head = currentVersion(root)
    val horizon = math.max(1L, head - keepVersions)
    val retained = (horizon to head)
      .flatMap(v => snapshot(root, Some(v)).map(_.name)).toSet
    import scala.jdk.CollectionConverters._
    val d = dataDir(root)
    if (!Files.isDirectory(d)) return Seq.empty
    val listing = Files.list(d)
    val onDisk = try listing.iterator().asScala.toSeq finally listing.close()
    val doomed = onDisk.filter(p => !retained.contains(p.getFileName.toString))
    doomed.foreach(Files.deleteIfExists(_))
    doomed.map(_.getFileName.toString)
  }

  /** Compaction as a commit: rewrite the current live set into
    * `numFiles` files, remove the originals — readers before/after see
    * exactly the same rows (spec-asserted), and time travel to the
    * pre-compaction version still works because old files are only
    * DE-REFERENCED, never deleted (vacuum is a separate policy). */
  def compact(spark: SparkSession, root: String, key: String,
              numFiles: Int = 4): Long = occRetry(root) { v =>
    val files = snapshot(root, None)
    val df = read(spark, root).repartition(numFiles)
    (writeFiles(spark, df, root, key, f"$v%010d-compact"),
      files.map(_.name), key)
  }
}
