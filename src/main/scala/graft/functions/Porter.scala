package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The classic Porter stemmer (M.F. Porter, "An algorithm for suffix
  * stripping", Program 14(3), 1980 — the public five-step rule
  * cascade), implemented from the paper's rule tables. This is the
  * ORIGINAL 1980 algorithm (no Porter2/Snowball revisions, no `logi`
  * addendum) — the variant every IR textbook and test-vector list
  * describes, so crafted specs can pin published pairs.
  *
  * Scope contract: defined over lowercase a–z words of length ≥ 3 (the
  * paper's domain); anything else — digits, hyphens, non-ASCII,
  * 1–2-letter words — passes through UNCHANGED. Callers tokenize and
  * lowercase first (the shared `tokens()` already does both), so
  * out-of-scope tokens keep their identity instead of being mangled.
  *
  * Within each of steps 2/3/4 only the LONGEST matching suffix rule is
  * attempted; if its m-condition fails, the step does nothing (the
  * paper's semantics — a shorter suffix is NOT tried next, which is
  * what makes `rational` stay `rational` while `relational` → `relate`).
  */
object Porter {

  def stem(u: UTF8String): UTF8String = {
    val s = u.toString
    val t = stemWord(s)
    if (t == s) u else UTF8String.fromString(t)
  }

  /** True consonant test with the paper's y rule: y is a consonant at
    * position 0 and after a vowel, a vowel after a consonant. */
  private def cons(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !cons(w, i - 1)
    case _ => true
  }

  /** Porter's measure m of the stem `w`: the number of VC sequences in
    * the form [C](VC)^m[V]. */
  private def m(w: String): Int = {
    val n = w.length
    var i = 0
    var count = 0
    while (i < n && cons(w, i)) i += 1
    while (i < n) {
      while (i < n && !cons(w, i)) i += 1
      if (i < n) {
        count += 1
        while (i < n && cons(w, i)) i += 1
      }
    }
    count
  }

  private def hasVowel(w: String): Boolean = {
    var i = 0
    while (i < w.length) { if (!cons(w, i)) return true; i += 1 }
    false
  }

  /** *d — ends with a double consonant. */
  private def endsDoubleC(w: String): Boolean = {
    val n = w.length
    n >= 2 && w.charAt(n - 1) == w.charAt(n - 2) && cons(w, n - 1)
  }

  /** *o — ends consonant-vowel-consonant where the final consonant is
    * not w, x or y (the "add an e" / "keep the e" trigger). */
  private def endsCvc(w: String): Boolean = {
    val n = w.length
    if (n < 3) return false
    val last = w.charAt(n - 1)
    cons(w, n - 1) && !cons(w, n - 2) && cons(w, n - 3) &&
      last != 'w' && last != 'x' && last != 'y'
  }

  /** First rule whose suffix matches wins the step (lists are ordered so
    * a longer overlapping suffix precedes its shorter tail); the
    * replacement fires only when m(stem) exceeds `mGt`. */
  private def ruleStep(w: String, mGt: Int, rules: Seq[(String, String)]): String = {
    rules.foreach { case (suf, rep) =>
      if (w.endsWith(suf)) {
        val stem = w.dropRight(suf.length)
        return if (m(stem) > mGt) stem + rep else w
      }
    }
    w
  }

  private val Step2: Seq[(String, String)] = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence",
    "anci" -> "ance", "izer" -> "ize", "abli" -> "able", "alli" -> "al",
    "entli" -> "ent", "eli" -> "e", "ousli" -> "ous", "ization" -> "ize",
    "ation" -> "ate", "ator" -> "ate", "alism" -> "al",
    "iveness" -> "ive", "fulness" -> "ful", "ousness" -> "ous",
    "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

  private val Step3: Seq[(String, String)] = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private val Step4: Seq[String] = Seq(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  def stemWord(word: String): String = {
    val n = word.length
    if (n <= 2) return word
    var i = 0
    while (i < n) {
      val c = word.charAt(i)
      if (c < 'a' || c > 'z') return word
      i += 1
    }
    var w = word

    // Step 1a: plurals
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ies")) w = w.dropRight(2)
    else if (!w.endsWith("ss") && w.endsWith("s")) w = w.dropRight(1)

    // Step 1b: -ed / -ing
    var cleanup = false
    if (w.endsWith("eed")) {
      if (m(w.dropRight(3)) > 0) w = w.dropRight(1) // eed → ee
    } else if (w.endsWith("ed") && hasVowel(w.dropRight(2))) {
      w = w.dropRight(2); cleanup = true
    } else if (w.endsWith("ing") && hasVowel(w.dropRight(3))) {
      w = w.dropRight(3); cleanup = true
    }
    if (cleanup) {
      if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
      else if (endsDoubleC(w) && !"lsz".contains(w.last)) w = w.dropRight(1)
      else if (m(w) == 1 && endsCvc(w)) w += "e"
    }

    // Step 1c: y → i after a vowel-bearing stem
    if (w.endsWith("y") && hasVowel(w.dropRight(1))) w = w.dropRight(1) + "i"

    // Steps 2–3: suffix tables, condition m > 0
    w = ruleStep(w, 0, Step2)
    w = ruleStep(w, 0, Step3)

    // Step 4: deletions, condition m > 1; -ion additionally requires
    // the stem to end in s or t
    Step4.find(w.endsWith) match {
      case Some(suf) =>
        val stem = w.dropRight(suf.length)
        val extra = suf != "ion" ||
          (stem.nonEmpty && (stem.last == 's' || stem.last == 't'))
        if (m(stem) > 1 && extra) w = stem
      case None => ()
    }

    // Step 5a: trailing e
    if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      val a = m(stem)
      if (a > 1 || (a == 1 && !endsCvc(stem))) w = stem
    }
    // Step 5b: -ll → -l when m > 1
    if (m(w) > 1 && endsDoubleC(w) && w.last == 'l') w = w.dropRight(1)
    w
  }
}

/** `graft_porter(text)` → STRING: the classic Porter stem of a single
  * lowercase word (identity on out-of-scope tokens). Compiled Scala
  * invoked from generated code, inside whole-stage codegen like the
  * other graft expressions. */
case class PorterStem(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_porter"

  override protected def nullSafeEval(in: Any): Any =
    Porter.stem(in.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.Porter.stem($in);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
