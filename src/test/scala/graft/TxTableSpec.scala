package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Sources, TxTable}

/** The log-structured ACID table: snapshot isolation, merge-with-
  * file-pruning, time travel, compaction invariance, crash safety
  * (orphaned files invisible), and the optimistic-concurrency commit. */
class TxTableSpec extends AnyFunSuite with SharedSpark {

  private def mkTable(prefix: String) = {
    import spark.implicits._
    val root = tempDir(prefix).toString + "/tbl"
    val base = (0L until 1000L).map(k => (k, s"v$k")).toDF("k", "v")
      .repartitionByRange(4, col("k"))   // 4 files, disjoint key ranges
    TxTable.create(spark, base, root, "k")
    (root, base)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toSet

  test("create + read round-trips; version starts at 1") {
    val (root, base) = mkTable("txt-rt")
    assert(TxTable.currentVersion(root) === 1L)
    assert(rows(TxTable.read(spark, root)) === rows(base))
    assert(TxTable.snapshot(root).size === 4)
  }

  test("merge equals the relational upsert and prunes untouched files") {
    import spark.implicits._
    val (root, base) = mkTable("txt-merge")
    val before = TxTable.snapshot(root).map(_.name).toSet
    // updates confined to keys 0..99 — they intersect exactly ONE of
    // the four range files
    val upd = (0L until 150L by 3L).map(k => (k, s"u$k")).toDF("k", "v")
      .filter(col("k") < 100)
    TxTable.merge(spark, root, upd, "k")
    val expect = rows(Sources.upsert(base, upd, "k"))
    assert(rows(TxTable.read(spark, root)) === expect)
    // pruning: at least 3 of the 4 original files survived untouched
    val after = TxTable.snapshot(root).map(_.name).toSet
    assert((before intersect after).size >= 3,
      s"merge rewrote untouched files: before=$before after=$after")
  }

  test("pure-insert merge touches nothing and appends") {
    import spark.implicits._
    val (root, base) = mkTable("txt-insert")
    val before = TxTable.snapshot(root).map(_.name).toSet
    val ins = Seq((5000L, "new5000"), (5001L, "new5001")).toDF("k", "v")
    TxTable.merge(spark, root, ins, "k")
    assert(rows(TxTable.read(spark, root)) === rows(base) ++
      Set((5000L, "new5000"), (5001L, "new5001")))
    val after = TxTable.snapshot(root).map(_.name).toSet
    assert(before.subsetOf(after), "pure inserts must not rewrite files")
  }

  test("time travel: pre-merge snapshot stays readable after merge + compact") {
    import spark.implicits._
    val (root, base) = mkTable("txt-tt")
    val v1 = TxTable.currentVersion(root)
    TxTable.merge(spark, root,
      Seq((0L, "changed")).toDF("k", "v"), "k")
    TxTable.compact(spark, root, "k", numFiles = 2)
    assert(rows(TxTable.read(spark, root, asOf = Some(v1))) === rows(base))
    val cur = rows(TxTable.read(spark, root))
    assert(cur.contains((0L, "changed")) && cur.size === 1000)
  }

  test("compaction preserves rows exactly and shrinks the file count") {
    val (root, base) = mkTable("txt-compact")
    TxTable.compact(spark, root, "k", numFiles = 2)
    assert(TxTable.snapshot(root).size === 2)
    assert(rows(TxTable.read(spark, root)) === rows(base))
  }

  test("orphaned data files are invisible (crash safety)") {
    import spark.implicits._
    val (root, base) = mkTable("txt-orphan")
    // a crashed writer leaves data files with NO commit record: write a
    // stray parquet straight into the data dir
    Seq((9999L, "ghost")).toDF("k", "v").write.mode("overwrite")
      .parquet(root + "/data/stray-orphan")
    assert(rows(TxTable.read(spark, root)) === rows(base))
  }

  test("vacuum: reclaims past-horizon files, keeps retained time travel") {
    import spark.implicits._
    val (root, base) = mkTable("txt-vac")           // v1
    TxTable.merge(spark, root,
      Seq((0L, "m1")).toDF("k", "v"), "k")          // v2
    TxTable.compact(spark, root, "k", numFiles = 2) // v3
    // keepVersions=1 retains v2+v3 live sets; v1's merged-away file
    // (the one v2 rewrote) is in neither and must be reclaimed
    val deleted = TxTable.vacuum(root, keepVersions = 1)
    assert(deleted.nonEmpty)
    // head and the retained previous version still read perfectly
    assert(rows(TxTable.read(spark, root)).size === 1000)
    assert(rows(TxTable.read(spark, root, asOf = Some(2L)))
      .contains((0L, "m1")))
    // past the horizon the read fails LOUDLY (missing file), never lies
    intercept[Exception] {
      TxTable.read(spark, root, asOf = Some(1L)).collect()
    }
    // idempotent: nothing left to reclaim
    assert(TxTable.vacuum(root, keepVersions = 1).isEmpty)
  }

  test("string keys: pruning degrades to full rewrite, never a missed file") {
    import spark.implicits._
    val root = tempDir("txt-strkey").toString + "/tbl"
    val base = (0 until 100).map(i => (s"key$i", s"v$i")).toDF("k", "v")
      .repartition(3)
    TxTable.create(spark, base, root, "k")
    // every string key casts to null on both sides: stats record the
    // full range, probes touch every file — correct, just unpruned
    TxTable.merge(spark, root, Seq(("key5", "changed")).toDF("k", "v"), "k")
    val out = TxTable.read(spark, root).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out.size === 100 && out.contains(("key5", "changed")))
    TxTable.deleteKeys(spark, root, Seq(Tuple1("key7")).toDF("k"), "k")
    assert(TxTable.read(spark, root).count() === 99)
  }

  test("optimistic concurrency: version collision retries past the winner") {
    import spark.implicits._
    val (root, _) = mkTable("txt-occ")
    // another committer wins version 2 first (valid empty commit)
    val rec = """{"version":2,"key":"k","adds":[],"removes":[]}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "_graft_log", "v0000000002.json"),
      rec.getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE_NEW)
    TxTable.merge(spark, root, Seq((1L, "retry")).toDF("k", "v"), "k")
    assert(TxTable.currentVersion(root) === 3L)
    assert(rows(TxTable.read(spark, root)).contains((1L, "retry")))
  }
}
