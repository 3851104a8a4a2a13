package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Similarity}

/** d33/d34/st33 content-defined chunking + s24 BFS hops: the CDC
  * shift-resistance property, lossless re-assembly, incremental
  * consistency, artifact guards, and BFS level semantics. */
class CdcChunkSpec extends AnyFunSuite with SharedSpark {

  private def docsOf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("cdc chunks: boundaries are content-local — a prefix edit leaves downstream chunks byte-identical") {
    // varied lengths + characters (seeded, deterministic): the boundary
    // rule hashes (len, first, last), so a constant-prefix token corpus
    // like "tokN" is degenerate — real text is not
    val rnd = new scala.util.Random(42)
    val body = (1 to 120).map(_ =>
      rnd.alphanumeric.filter(_.isLetterOrDigit).take(rnd.nextInt(6) + 2)
        .mkString.toLowerCase).mkString(" ")
    val a = Dedup.cdcChunks(docsOf(Seq((1L, body))), hashKeys = false)
      .collect().map(_.getAs[String]("chunk_text")).toSeq
    val b = Dedup.cdcChunks(docsOf(Seq((1L, s"inserted prefix words $body"))),
      hashKeys = false)
      .collect().map(_.getAs[String]("chunk_text")).toSeq
    // fixed-size chunking would shift EVERY boundary; CDC re-chunks only
    // the edited neighborhood — the suffix chunk sets must overlap
    val shared = a.toSet intersect b.toSet
    assert(shared.nonEmpty,
      s"no chunk survived a prefix edit — boundaries are not content-local: a=$a b=$b")
    // and specifically the TAIL chunk (farthest from the edit) survives
    assert(b.toSet.contains(a.last),
      s"tail chunk did not survive a prefix edit: a.last=${a.last}")
  }

  test("cdc chunks: ordered re-assembly is lossless and spans tile the document") {
    val text = (1 to 45).map(i => s"w${i * 13 % 89}").mkString(" ")
    val out = Dedup.cdcChunks(docsOf(Seq((7L, text))), hashKeys = false)
      .orderBy(col("chunk_idx")).collect()
    assert(out.map(_.getAs[String]("chunk_text")).mkString(" ") === text)
    // spans tile [1, n] without gaps or overlap
    val spans = out.map(r => (r.getAs[Int]("start_p"), r.getAs[Int]("end_p")))
    assert(spans.head._1 === 1 && spans.last._2 === 45)
    spans.sliding(2).foreach {
      case Array((_, e1), (s2, _)) => assert(s2 === e1 + 1)
      case _ =>
    }
    out.foreach(r => assert(r.getAs[Int]("n_tokens") ===
      r.getAs[Int]("end_p") - r.getAs[Int]("start_p") + 1))
  }

  test("cdc chunks: duplicated content is counted corpus-wide, hashed and string keys agree") {
    val shared = (1 to 40).map(i => s"s${i * 11 % 83}").mkString(" ")
    val docs = docsOf(Seq((1L, shared), (2L, shared), (3L, "totally different words here")))
    Seq(true, false).foreach { hk =>
      val out = Dedup.cdcChunks(docs, hashKeys = hk).collect()
      val d1 = out.filter(_.getAs[Long]("doc_id") == 1L)
      assert(d1.nonEmpty && d1.forall(_.getAs[Long]("n_dup") === 2L),
        s"identical docs must share every chunk (hashKeys=$hk)")
      assert(out.filter(_.getAs[Long]("doc_id") == 3L)
        .forall(_.getAs[Long]("n_dup") === 1L))
    }
  }

  test("incremental: flags equal the batch-vs-corpus recompute; divisor mismatch refused") {
    val docs = table("documents")
    val corpus = Dedup.cdcChunkCounts(
      docs.filter(pmod(col("doc_id"), lit(2)) === 1)).localCheckpoint()
    val batch = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
    val inc = Dedup.cdcChunksIncremental(batch, corpus)
    // in_corpus=1 rows are exactly the batch chunks whose text appears
    // among corpus chunks (recomputed directly, string keys)
    val corpusTexts = Dedup.cdcChunks(
      docs.filter(pmod(col("doc_id"), lit(2)) === 1), hashKeys = false)
      .select(col("chunk_text")).distinct()
      .collect().map(_.getString(0)).toSet
    val flagged = inc.collect()
    assert(flagged.nonEmpty)
    flagged.foreach { r =>
      val expect = if (corpusTexts.contains(r.getAs[String]("chunk_text"))) 1 else 0
      assert(r.getAs[Int]("in_corpus") === expect, r.toString)
    }
    intercept[IllegalArgumentException] {
      Dedup.cdcChunksIncremental(batch, corpus, divisor = 32).collect()
    }
  }

  test("bfs hops: levels, min-hop on a diamond, maxHops bound, unreachable absent") {
    import spark.implicits._
    // 0→1→2→3→4→5 chain plus shortcut 0→3 (diamond: 3 reachable at hop 1)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (0L, 3L),
      (9L, 10L)) // disconnected island
      .toDF("src", "dst")
    val seeds = Seq(0L).toDF("vec_id")
    val out = Similarity.bfsHops(edges, seeds, maxHops = 3)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("hop")).toMap
    assert(out === Map(0L -> 0, 1L -> 1, 3L -> 1, 2L -> 2, 4L -> 2, 5L -> 3),
      s"got $out")
    // 9/10 unreachable from the seed; nothing past maxHops
    assert(!out.contains(9L) && !out.contains(10L))
  }

  test("shortest paths: weighted min beats fewer-hops, budget invariant, monotone reach") {
    import spark.implicits._
    // 0→3 direct costs 5; 0→1→2→3 costs 1+1+1 = 3 — the weighted
    // answer DISAGREES with BFS (which would take the 1-hop shortcut)
    val edges = Seq((0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L), (0L, 3L, 5L),
      (3L, 4L, 2L), (9L, 10L, 1L)).toDF("src", "dst", "w")
    val seeds = Seq(0L).toDF("vec_id")
    val out = Similarity.shortestPaths(edges, seeds, rounds = 6)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("dist")).toMap
    assert(out === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 5L), s"got $out")
    assert(!out.contains(9L) && !out.contains(10L))
    // round budget: with 2 rounds only paths of <= 2 edges exist — the
    // direct 0→3 edge (cost 5) wins because the 3-edge path is not yet
    // relaxed; exactly the invariant the recursive-CTE oracle replays
    val two = Similarity.shortestPaths(edges, seeds, rounds = 2)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("dist")).toMap
    assert(two(3L) === 5L, s"2-round distance should be the 1-hop edge, got ${two(3L)}")
    // bounded-round contract on the corpus graph: a bigger budget only
    // ever EXTENDS the reach set and IMPROVES (never worsens) distances
    val emb = table("embeddings")
    val e = Similarity.knnGraphLsh(emb)
      .select(col("q_id").as("src"), col("neighbor_id").as("dst"),
        col("rank").cast("long").as("w")).localCheckpoint()
    val s = emb.filter(col("vec_id") < 3).select(col("vec_id"))
    def run(r: Int) = Similarity.shortestPaths(e, s, r).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    val r8 = run(8); val r10 = run(10)
    assert(r8.keySet.subsetOf(r10.keySet))
    r8.foreach { case (v, d) => assert(r10(v) <= d, s"node $v worsened: $d -> ${r10(v)}") }
    // and SSSP reach under budget R == BFS reach under R hops (same edges)
    val bfs = Similarity.bfsHops(e.select(col("src"), col("dst")), s, maxHops = 8)
      .collect().map(_.getLong(0)).toSet
    assert(r8.keySet === bfs, "reach set must equal BFS at the same edge budget")
  }
}
