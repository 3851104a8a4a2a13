package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextOps

/** t11 gate: corpus-learned BPE. The reference below is an INDEPENDENT
  * re-implementation of the published algorithm (naive quadratic forms,
  * no shared code with graft.functions.Bpe) — the parity assertions are
  * the rows-only key's correctness evidence, like s6's k-means spec. */
class BpeSpec extends AnyFunSuite with SharedSpark {

  // ---- independent reference: learn ----
  private def refLearn(wordCounts: Seq[(String, Long)], k: Int): Seq[(String, String)] = {
    var segs: Map[List[String], Long] =
      wordCounts.groupBy(_._1.toList.map(_.toString)).view
        .mapValues(_.map(_._2).sum).toMap
    var out = List.empty[(String, String)]
    for (_ <- 1 to k if segs.keys.exists(_.length > 1)) {
      val pairCounts = segs.toSeq
        .flatMap { case (syms, c) => syms.zip(syms.tail).map(p => (p, c)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      if (pairCounts.nonEmpty) {
        val ((a, b), _) = pairCounts.minBy { case ((x, y), c) => (-c, x, y) }
        out = out :+ (a, b)
        segs = segs.map { case (syms, c) => (refMerge(syms, a, b), c) }
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      }
    }
    out
  }

  private def refMerge(syms: List[String], a: String, b: String): List[String] =
    syms match {
      case x :: y :: rest if x == a && y == b => (a + b) :: refMerge(rest, a, b)
      case x :: rest => x :: refMerge(rest, a, b)
      case Nil => Nil
    }

  // ---- independent reference: encode (re-merge until fixpoint) ----
  private def refEncode(word: String, merges: Seq[(String, String)]): List[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = word.toList.map(_.toString)
    var changed = true
    while (changed && syms.length > 1) {
      val applicable = syms.zip(syms.tail).flatMap(p => rank.get(p).map(r => (r, p)))
      if (applicable.isEmpty) changed = false
      else {
        val (_, (a, b)) = applicable.minBy(_._1)
        syms = refMerge(syms, a, b)
      }
    }
    syms
  }

  test("learn matches a hand-checked tiny corpus") {
    // "low" x5, "lower" x2, "newest" x6, "widest" x3  (classic example)
    val wc = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = graft.functions.Bpe.learn(wc, 4)
    // pair counts round 1: (e,s)=9, (s,t)=9, (l,o)=7, (o,w)=7, ... —
    // ties break lexicographically: (e,s) before (s,t)
    assert(merges.head === ("e", "s"))
    assert(merges === refLearn(wc, 4))
  }

  test("learn parity with the independent reference on the real corpus") {
    val docs = table("documents")
    val wc = docs.select(explode(graft.functions.ColumnFns.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(TextOps.bpeLearn(docs, numMerges = 25) === refLearn(wc, 25))
  }

  test("operator output equals the reference segmentation end-to-end") {
    val docs = table("documents")
    val merges = TextOps.bpeLearn(docs, numMerges = 25)
    val got = TextOps.bpeTokenize(docs, merges)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(texts.nonEmpty)
    texts.foreach { case (id, text) =>
      val words = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      val toks = words.flatMap(w => refEncode(w, merges))
      val (nWords, nToks, bpeText) = got(id)
      assert(nWords === words.length, s"doc $id n_words")
      assert(nToks === toks.length, s"doc $id n_bpe_tokens")
      assert(bpeText === toks.mkString(" "), s"doc $id segmentation")
    }
  }

  test("segmentation invariants: concat restores the word; merges shrink counts") {
    val docs = table("documents")
    val out = TextOps.bpeTokens(docs, numMerges = 25)
      .select(col("n_words"), col("n_bpe_tokens"))
      .collect()
    // BPE never crosses word boundaries and never drops characters:
    // n_words <= n_bpe_tokens, and with 0 merges tokens = total chars
    out.foreach(r => assert(r.getInt(0) <= r.getInt(1)))
    val zero = TextOps.bpeTokenize(docs, Seq.empty)
      .withColumn("_chars", length(regexp_replace(lower(trim(col("bpe_text"))), " ", "")))
      .collect()
    zero.foreach { r =>
      assert(r.getAs[Int]("n_bpe_tokens") === r.getAs[Int]("_chars"))
    }
  }

  test("merge table round-trips through parquet with identical segmentation") {
    val docs = table("documents")
    val merges = TextOps.bpeLearn(docs, numMerges = 25)
    val dir = tempDir("graft-bpe-model")
    try {
      TextOps.bpeMergesDF(spark, merges).write.mode("overwrite")
        .parquet(s"$dir/merges")
      val loaded = TextOps.bpeMergesFrom(
        spark.read.parquet(s"$dir/merges").orderBy(rand(7)))
      assert(loaded === merges)
      val a = TextOps.bpeTokenize(docs, merges).collect().map(_.toString).sorted
      val b = TextOps.bpeTokenize(docs, loaded).collect().map(_.toString).sorted
      assert(a.sameElements(b))
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
    }
  }

  test("edge cases: empty text, one-char words, no applicable merges") {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, "a"), (3L, "a b c"), (4L, "  padded  "))
      .toDF("doc_id", "text")
    val out = TextOps.bpeTokenize(df, Seq(("x", "y")))
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getString(3))).toMap
    assert(out(1L) === ((0, "")))          // empty doc -> zero tokens
    assert(out(2L) === ((1, "a")))         // single char word survives
    assert(out(3L) === ((3, "a b c")))     // no merge applies -> chars
    assert(out(4L) === ((6, "p a d d e d"))) // trimmed, chars (no merges)
  }

  test("graft_bpe_segment rejects a null merges literal at analysis time") {
    import spark.implicits._
    val df = Seq((1L, "ab")).toDF("doc_id", "text")
    val ex = intercept[Exception] {
      df.select(expr("graft_bpe_segment(text, CAST(NULL AS ARRAY<STRING>))")).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("null"))
    // a valid empty merge table is still fine (chars pass through)
    val ok = df.select(expr("graft_bpe_segment(text, CAST(ARRAY() AS ARRAY<STRING>))").as("t")).collect()(0)
    assert(ok.getSeq[String](0) === Seq("a", "b"))
  }

  test("greedy merge honors rank order, not adjacency order") {
    // merges: (b,c) rank 0, (a,b) rank 1 — "abc" must become [a, bc]
    val m = Seq(("b", "c"), ("a", "b"))
    assert(graft.functions.Bpe.encodeWord("abc", graft.functions.Bpe.ranksOf(m)).toSeq
      === Seq("a", "bc"))
    // overlap is leftmost-first: (a,a) on "aaa" -> [aa, a]
    assert(graft.functions.Bpe.encodeWord("aaa",
      graft.functions.Bpe.ranksOf(Seq(("a", "a")))).toSeq === Seq("aa", "a"))
  }

  test("fertility: per-language ratios exact, zero-denominator lang null") {
    import spark.implicits._
    import graft.operators.TextOps
    val docs = Seq(
      (1L, "ab cd", "en"), (2L, "wxyz", "en"),
      (3L, "foo", "zh"),
      (4L, "", "xx"))                            // empty: zero words
      .toDF("doc_id", "text", "lang")
    val counts = Seq((1L, 2L, 4L), (2L, 1L, 2L), (3L, 1L, 3L), (4L, 0L, 0L))
      .toDF("doc_id", "n_words", "n_bpe_tokens")
    val out = TextOps.bpeFertility(docs, counts).collect()
      .map(r => r.getString(0) -> r).toMap
    // en: 6 subwords / 3 words = 2.0; bytes "ab cd"+"wxyz" = 9 → 9/6 = 1.5
    val en = out("en")
    assert(en.getAs[Long]("n_bytes") === 9L)
    assert(en.getAs[Double]("fertility") === 2.0)
    assert(en.getAs[Double]("bytes_per_token") === 1.5)
    assert(out("zh").getAs[Double]("fertility") === 3.0)
    val xx = out("xx")
    assert(xx.isNullAt(xx.fieldIndex("fertility")) &&
      xx.isNullAt(xx.fieldIndex("bytes_per_token")))
  }
}
