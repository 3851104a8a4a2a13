package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Porter
import graft.operators.TextOps

/** Porter 1980 cascade pinned against the paper's published example
  * pairs, plus the relational t26 surface (vocab table + conflation
  * stats). */
class PorterSpec extends AnyFunSuite with SharedSpark {

  test("step 1: plurals and -ed/-ing with their cleanup rules") {
    val pairs = Seq(
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat",
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
      "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
      "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
      "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
      "filing" -> "file",
      "happy" -> "happi", "sky" -> "sky")
    pairs.foreach { case (in, out) =>
      assert(Porter.stemWord(in) === out, s"$in")
    }
  }

  test("steps 2-4: suffix tables with longest-match-stops semantics") {
    val pairs = Seq(
      // the paper's step-2/3 families, run through the FULL cascade
      "relational" -> "relat", "conditional" -> "condit",
      "rational" -> "ration", "valenci" -> "valenc",
      "digitizer" -> "digit", "operator" -> "oper",
      "feudalism" -> "feudal", "decisiveness" -> "decis",
      "hopefulness" -> "hope", "formaliti" -> "formal",
      "formative" -> "form", "formalize" -> "formal",
      "electriciti" -> "electr", "electrical" -> "electr",
      "hopeful" -> "hope", "goodness" -> "good",
      // step 4 deletions (m > 1) incl. the -ion s/t guard
      "revival" -> "reviv", "allowance" -> "allow",
      "inference" -> "infer", "airliner" -> "airlin",
      "adjustable" -> "adjust", "defensible" -> "defens",
      "replacement" -> "replac", "adjustment" -> "adjust",
      "dependent" -> "depend", "adoption" -> "adopt",
      "communism" -> "commun", "activate" -> "activ",
      "effective" -> "effect", "generalization" -> "gener")
    pairs.foreach { case (in, out) =>
      assert(Porter.stemWord(in) === out, s"$in")
    }
  }

  test("step 5 and scope guards: e-drop, ll, out-of-scope identity") {
    assert(Porter.stemWord("probate") === "probat")
    assert(Porter.stemWord("rate") === "rate")
    assert(Porter.stemWord("cease") === "ceas")
    assert(Porter.stemWord("controlling") === "control")
    assert(Porter.stemWord("roll") === "roll")
    // out of scope: short words, digits, non-ASCII pass through
    assert(Porter.stemWord("a") === "a")
    assert(Porter.stemWord("it") === "it")
    assert(Porter.stemWord("x86") === "x86")
    assert(Porter.stemWord("café") === "café")
    assert(Porter.stemWord("") === "")
  }

  test("native expression matches the Scala reference on real tokens") {
    import spark.implicits._
    val words = table("documents")
      .select(explode(graft.functions.ColumnFns.tokens(col("text"))).as("w"))
      .distinct()
    val viaExpr = words
      .withColumn("s", call_function("graft_porter", col("w")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    viaExpr.foreach { case (w, s) =>
      assert(s === Porter.stemWord(w), w)
    }
    assert(viaExpr.nonEmpty)
  }

  test("topStems conflates planted inflection families") {
    import spark.implicits._
    val docs = Seq(
      (1L, "process processing processed processes"),
      (2L, "processing query queried querying"),
      (3L, "table tables")).toDF("doc_id", "text")
    val out = TextOps.topStems(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // four surface forms, one stem, df counts DOCS not occurrences
    assert(out("process") === ((2L, 4L, 5L)))
    assert(out("queri") === ((1L, 3L, 3L)))
    assert(out("tabl") === ((1L, 2L, 2L)))
    // vocab table: one row per distinct word, stem matches the reference
    val vocab = TextOps.porterVocab(docs).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(vocab.size === 9)
    assert(vocab("processes") === "process" && vocab("tables") === "tabl")
  }
}
