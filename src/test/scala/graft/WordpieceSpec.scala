package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Wordpiece
import graft.operators.TextOps

/** WordPiece tokenizer (t37): likelihood-scored fit (the property that
  * distinguishes the family from BPE), greedy longest-match inference,
  * the whole-word [UNK] fallback, and operator/expression parity. */
class WordpieceSpec extends AnyFunSuite with SharedSpark {

  test("fit is deterministic; continuation pieces carry ## and the alphabet survives") {
    val dict = Seq(("hugs", 10L), ("pug", 5L), ("pun", 12L),
      ("bun", 4L), ("hug", 5L))
    val v1 = Wordpiece.learn(dict, numMerges = 10)
    val v2 = Wordpiece.learn(dict, numMerges = 10)
    assert(v1 === v2)
    // word-initial chars as-is, internal chars ##-prefixed
    assert(v1.contains("h") && v1.contains("##u") && v1.contains("##g"))
    // merged symbols absorb the right side's ##
    assert(v1.exists(p => p.length > 1 && !p.startsWith("##")) ||
      v1.exists(p => p.startsWith("##") && p.length > 3))
  }

  test("merge scoring is likelihood gain, not raw pair count (the non-BPE property)") {
    // (a,##b) occurs 8 times but both symbols are very common elsewhere;
    // (x,##y) occurs 3 times with symbols occurring nowhere else —
    // count/(cnt_a·cnt_b): 8/(20·20)=0.02 < 3/(3·3)=0.33. BPE's raw-count
    // rule would merge ab first; WordPiece must merge xy first.
    val dict = Seq(("ab", 8L), ("ac", 6L), ("db", 6L), ("ad", 3L),
      ("cb", 3L), ("xy", 3L))
    val v = Wordpiece.learn(dict, numMerges = 1)
    assert(v.contains("xy"), s"expected the rare-symbol pair to merge first: $v")
    assert(!v.contains("ab"))
  }

  test("greedy longest-match-first; [UNK] only for uncovered words; lossless otherwise") {
    val vocab = new java.util.HashSet[String]()
    Seq("un", "##able", "##b", "##a", "##l", "##e", "u", "##n", "t").foreach(vocab.add)
    // longest match at position 0 is "un", then "##able" swallows the rest
    assert(Wordpiece.encodeWord("unable", vocab, 5).toSeq === Seq("un", "##able"))
    // strip-and-concat losslessness
    val seg = Wordpiece.encodeWord("unab", vocab, 5)
    assert(seg.map(Wordpiece.strip).mkString === "unab")
    // an unmatchable position collapses the WHOLE word (BERT semantics)
    assert(Wordpiece.encodeWord("unz", vocab, 5).toSeq === Seq(Wordpiece.Unk))
    assert(Wordpiece.encodeWord("zun", vocab, 5).toSeq === Seq(Wordpiece.Unk))
  }

  test("every emitted piece is the longest vocab match at its position") {
    val docs = table("documents")
    val vocab = TextOps.wordpieceLearn(docs, numMerges = 60)
    val vs = new java.util.HashSet[String](); vocab.foreach(vs.add)
    val maxLen = vocab.map(Wordpiece.strip(_).length).max
    val words = docs.select(explode(graft.functions.ColumnFns.tokens(col("text"))))
      .distinct().limit(300).collect().map(_.getString(0))
    words.foreach { w =>
      val seg = Wordpiece.encodeWord(w, vs, maxLen)
      if (seg.toSeq != Seq(Wordpiece.Unk)) {
        assert(seg.map(Wordpiece.strip).mkString === w, s"lossy: $w -> ${seg.toSeq}")
        var pos = 0
        seg.foreach { p =>
          val content = Wordpiece.strip(p)
          // no LONGER vocab piece could have matched here
          ((content.length + 1) to (w.length - pos)).foreach { l =>
            val longer = w.substring(pos, pos + l)
            val cand = if (pos == 0) longer else "##" + longer
            assert(!vs.contains(cand), s"$w@$pos: took $p but $cand is in vocab")
          }
          pos += content.length
        }
      }
    }
  }

  test("operator layer: expression parity with the driver-side reference, unk count") {
    val docs = table("documents").limit(100)
    val vocab = TextOps.wordpieceLearn(table("documents"), numMerges = 60)
    val vs = new java.util.HashSet[String](); vocab.foreach(vs.add)
    val maxLen = vocab.map(Wordpiece.strip(_).length).max
    val out = TextOps.wordpieceTokenize(docs, vocab).collect()
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val words = texts(r.getAs[Long]("doc_id"))
        .toLowerCase(java.util.Locale.ROOT).trim.split("\\s+").filter(_.nonEmpty)
      val ref = words.flatMap(w => Wordpiece.encodeWord(w, vs, maxLen))
      assert(r.getAs[Int]("n_wp_tokens") === ref.length)
      assert(r.getAs[String]("wp_text") === ref.mkString(" "))
      assert(r.getAs[Int]("n_unk") === ref.count(_ == Wordpiece.Unk))
    }
  }
}
