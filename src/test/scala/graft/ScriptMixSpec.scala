package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextOps

/** Crafted-row exactness for t25_script_mix: dominant-script argmax +
  * alphabetical tie-break, the scriptless `none`/NULL branch, and
  * ratRound latin-share rounding on a true decimal half. */
class ScriptMixSpec extends AnyFunSuite with SharedSpark {

  private def run(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    TextOps.scriptMix(rows.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r).toMap
  }

  test("mixed-script doc counts every class and picks the max count") {
    val out = run(Seq(
      (1L, "data данные 数据 δ"),   // 4 latin, 6 cyrillic, 2 cjk, 1 greek
      (2L, "한국어 נתונים بيانات"))) // 3 hangul, 6 hebrew, 6 arabic
    val d1 = out(1L)
    assert(d1.getAs[Long]("n_latin") === 4L)
    assert(d1.getAs[Long]("n_cyrillic") === 6L)
    assert(d1.getAs[Long]("n_cjk") === 2L)
    assert(d1.getAs[Long]("n_greek") === 1L)
    assert(d1.getAs[Long]("n_script") === 13L)
    assert(d1.getAs[String]("dominant_script") === "cyrillic")
    val d2 = out(2L)
    assert(d2.getAs[Long]("n_hangul") === 3L)
    assert(d2.getAs[Long]("n_hebrew") === 6L)
    assert(d2.getAs[Long]("n_arabic") === 6L)
    // 6-6 tie between arabic and hebrew → alphabetically FIRST name
    assert(d2.getAs[String]("dominant_script") === "arabic")
  }

  test("equal-count ties resolve to the alphabetically first script name") {
    // one letter of each of the seven classes → 7-way tie → "arabic"
    val out = run(Seq((1L, "a я 字 δ 한 א ب")))
    val d = out(1L)
    Seq("arabic", "cjk", "cyrillic", "greek", "hangul", "hebrew", "latin")
      .foreach(nm => assert(d.getAs[Long](s"n_$nm") === 1L, nm))
    assert(d.getAs[String]("dominant_script") === "arabic")
    // latin share 1/7 → 142857.14…e-6 rounds half-even-free to 0.142857
    assert(d.getAs[Double]("latin_share") === 0.142857)
  }

  test("scriptless doc routes to none with NULL latin share") {
    val out = run(Seq((1L, "123 456 --- !!! ×÷"), (2L, "")))
    Seq(1L, 2L).foreach { id =>
      val d = out(id)
      assert(d.getAs[Long]("n_script") === 0L)
      assert(d.getAs[String]("dominant_script") === "none")
      assert(d.isNullAt(d.fieldIndex("latin_share")))
    }
  }

  test("latin share is an exact rational: 1/640 true-half rounds away") {
    // 1/640 · 1e6 = 1562.5 — a TRUE decimal half (640 = 2^7·5) whose
    // double is exact-adjacent; ratRound must give 0.001563 from pure
    // integer arithmetic (the t17 round-10 driver-FAIL boundary)
    val out = run(Seq((1L, "a" + "я" * 639)))
    val d = out(1L)
    assert(d.getAs[Long]("n_latin") === 1L)
    assert(d.getAs[Long]("n_script") === 640L)
    assert(d.getAs[Double]("latin_share") === 0.001563)
    assert(d.getAs[String]("dominant_script") === "cyrillic")
  }

  test("out-of-class letters count as no script (documented boundary)") {
    // U+1E47 ṇ is Latin Extended Additional — outside the fixed Latin
    // range by contract; alone it routes to none
    val out = run(Seq((1L, "ṇṇṇ"), (2L, "plain latin")))
    assert(out(1L).getAs[String]("dominant_script") === "none")
    assert(out(2L).getAs[String]("dominant_script") === "latin")
    assert(out(2L).getAs[Double]("latin_share") === 1.0)
  }
}
