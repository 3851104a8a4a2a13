package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Unigram
import graft.operators.TextOps

/** Unigram-LM tokenizer (t35): fit determinism, Viterbi semantics,
  * losslessness, UNK handling, and the operator layer's parity with the
  * native expression. */
class UnigramSpec extends AnyFunSuite with SharedSpark {

  private val dict = Seq(
    ("interesting", 30L), ("interest", 20L), ("resting", 15L),
    ("rest", 25L), ("ing", 5L), ("in", 10L), ("test", 40L))

  test("fit is deterministic and keeps full character coverage") {
    val m1 = Unigram.learn(dict, vocabSize = 50)
    val m2 = Unigram.learn(dict, vocabSize = 50)
    assert(m1 === m2)
    // every character of every dict word has a piece (coverage)
    val pieces = m1.map(_._1).toSet
    val chars = dict.flatMap(_._1.toSeq).map(_.toString).toSet
    assert(chars.subsetOf(pieces), s"missing chars: ${chars -- pieces}")
    // log-probs are finite, negative, and normalized from counts
    assert(m1.forall { case (_, lp) => lp < 0 && !lp.isInfinite })
  }

  test("viterbi prefers high-probability multi-char pieces and is lossless") {
    val model = Unigram.learn(dict, vocabSize = 50)
    val lp = new java.util.HashMap[String, java.lang.Double]()
    model.foreach { case (p, l) => lp.put(p, java.lang.Double.valueOf(l)) }
    val maxLen = model.map(_._1.length).max
    // frequent whole-dict words segment into few pieces, never per-char
    Seq("test", "rest", "interesting").foreach { w =>
      val seg = Unigram.viterbi(w, lp, maxLen)
      assert(seg.mkString === w, s"lossy segmentation of $w: ${seg.toSeq}")
      assert(seg.length < w.length,
        s"$w fell back to chars: ${seg.toSeq}")
    }
    // losslessness on arbitrary in-alphabet strings
    Seq("tsetter", "ginger", "i").foreach { w =>
      assert(Unigram.viterbi(w, lp, maxLen).mkString === w)
    }
  }

  test("unknown characters segment as themselves (total, never throws)") {
    val model = Unigram.learn(dict, vocabSize = 50)
    val lp = new java.util.HashMap[String, java.lang.Double]()
    model.foreach { case (p, l) => lp.put(p, java.lang.Double.valueOf(l)) }
    val maxLen = model.map(_._1.length).max
    val seg = Unigram.viterbi("zzqz", lp, maxLen)
    assert(seg.toSeq === Seq("z", "z", "q", "z"))
    // mixed known/unknown stays lossless
    assert(Unigram.viterbi("tezst", lp, maxLen).mkString === "tezst")
  }

  test("hard-EM concentrates mass: reused pieces beat one-off substrings") {
    // words longer than maxPieceLen=4 must segment compositionally, so
    // the 'ab' family accumulates EM mass across the frequent words; a
    // hapax word's pieces stay at the bottom of the distribution
    val d = Seq(("ababab", 50L), ("ababcd", 30L), ("ab", 20L), ("wxyz", 1L))
    val m = Unigram.learn(d, vocabSize = 30).toMap
    assert(m.contains("ab") || m.contains("abab"),
      s"no ab-family piece survived: ${m.keys.toSeq.sorted}")
    val strong = m.getOrElse("abab", m.getOrElse("ab", Double.NegativeInfinity))
    m.get("wxyz").foreach(weak => assert(strong > weak, s"$strong !> $weak"))
  }

  test("operator layer: expression parity, counts, and empty-doc contract") {
    import spark.implicits._
    val docs = Seq(
      (1L, "test rest interesting"),
      (2L, "TEST Test test"),   // case-folds to the fitted forms
      (3L, "")).toDF("doc_id", "text")
    val model = TextOps.unigramLearn(docs)
    val out = TextOps.unigramTokenize(docs, model).collect()
      .map(r => r.getLong(0) -> r).toMap
    // per-word Viterbi replayed directly must equal the expression path
    val lp = new java.util.HashMap[String, java.lang.Double]()
    model.foreach { case (p, l) => lp.put(p, java.lang.Double.valueOf(l)) }
    val maxLen = model.map(_._1.length).max
    val expect1 = Seq("test", "rest", "interesting")
      .flatMap(w => Unigram.viterbi(w, lp, maxLen))
    assert(out(1L).getAs[String]("unigram_text") === expect1.mkString(" "))
    assert(out(1L).getAs[Int]("n_unigram_tokens") === expect1.size)
    assert(out(1L).getAs[Int]("n_words") === 3)
    // case folding: three copies of 'test' segment identically
    val seg2 = out(2L).getAs[String]("unigram_text").split(" ").toSeq
    assert(seg2.size % 3 === 0 &&
      seg2.grouped(seg2.size / 3).toSeq.distinct.size === 1)
    // empty doc: zero tokens, empty text, never null
    assert(out(3L).getAs[Int]("n_unigram_tokens") === 0)
    assert(out(3L).getAs[String]("unigram_text") === "")
  }

  test("wrong model-row shape fails fast at expression init") {
    import spark.implicits._
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    val bad = docs.withColumn("_s",
      call_function("graft_unigram_segment", col("text"),
        lit(Array("no-space-row"))))
    val e = intercept[Exception] { bad.collect() }
    assert(e.getMessage != null)
  }
}
