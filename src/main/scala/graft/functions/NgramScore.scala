package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass rank-weighted char-n-gram profile scoring (the hot loop of
  * the Cavnar–Trenkle language ID, t14). The composable formulation —
  * one `aggregate` HOF per language, each probing a 40-entry map
  * LITERAL per gram — is a linear scan per probe: 8 langs × 40 keys ×
  * every gram of every document (measured 17.8 s at sf0.1, the whole
  * rest of the inventory averages < 1 s/key). This expression walks the
  * string once, does ONE O(1) hash lookup per gram, and accumulates all
  * language scores simultaneously — same doctrine as graft_bpe_segment:
  * the loop compiles, the model ships as a reference object. */
object NgramScores {

  /** Parse the profile literal. Entry 0 is the header "nLangs n"; every
    * other entry is "langIdx weight gram" (two space-delimited ints,
    * then the gram VERBATIM to the end — grams may themselves contain
    * spaces). Returns (gram → per-lang weight vector, nLangs, n). */
  def parse(arr: ArrayData): (java.util.HashMap[String, Array[Int]], Int, Int) = {
    require(arr.numElements() >= 1, "graft_ngram_score profiles need a header entry")
    val head = arr.getUTF8String(0).toString.split(" ")
    require(head.length == 2 && head.forall(_.matches("-?\\d+")),
      s"graft_ngram_score header ('${arr.getUTF8String(0)}') is not 'nLangs n'")
    val nLangs = head(0).toInt
    val n = head(1).toInt
    require(nLangs >= 1 && n >= 1, s"bad graft_ngram_score header: nLangs=$nLangs n=$n")
    val m = new java.util.HashMap[String, Array[Int]](arr.numElements() * 2)
    var i = 1
    while (i < arr.numElements()) {
      val e = arr.getUTF8String(i).toString
      val s1 = e.indexOf(' ')
      val s2 = if (s1 < 0) -1 else e.indexOf(' ', s1 + 1)
      // clear errors, not raw index/number exceptions: the function is
      // registered for external SQL, so a malformed hand-written profile
      // must fail with a message naming the entry (checkInputDataTypes
      // surfaces this at analysis time)
      require(s2 > s1 && s1 > 0,
        s"graft_ngram_score profile entry $i ('$e') is not 'langIdx weight gram'")
      val li =
        try e.substring(0, s1).toInt
        catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"graft_ngram_score profile entry $i ('$e'): langIdx is not an int") }
      val wt =
        try e.substring(s1 + 1, s2).toInt
        catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"graft_ngram_score profile entry $i ('$e'): weight is not an int") }
      require(li >= 0 && li < nLangs,
        s"graft_ngram_score profile entry $i ('$e'): langIdx $li outside [0, $nLangs)")
      val g = e.substring(s2 + 1)
      val w = m.computeIfAbsent(g, _ => new Array[Int](nLangs))
      w(li) = wt
      i += 1
    }
    (m, nLangs, n)
  }

  /** Code-point walk (DuckDB's substr and Spark's substring both count
    * characters, not UTF-16 units — parity holds on non-ASCII text). */
  def score(text: UTF8String, table: java.util.HashMap[String, Array[Int]],
            nLangs: Int, n: Int): ArrayData = {
    val cps = text.toString.codePoints().toArray
    val scores = new Array[Int](nLangs)
    var i = 0
    while (i + n <= cps.length) {
      val w = table.get(new String(cps, i, n))
      if (w != null) {
        var j = 0
        while (j < nLangs) { scores(j) += w(j); j += 1 }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(scores)
  }
}

/** `graft_ngram_score(text, profiles)` → array<int> of per-language
  * scores (langOrder index + 1 = array position). `profiles` must be a
  * foldable, non-null array<string> in [[NgramScores.parse]] format. */
case class NgramScore(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_ngram_score"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects a string text column, got ${left.dataType}")
    else if (!right.dataType.isInstanceOf[ArrayType] ||
             right.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<string> profiles, got ${right.dataType}")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName profiles must be a literal (foldable) table")
    else if (right.eval(null) == null)
      TypeCheckResult.TypeCheckFailure(s"$prettyName profiles literal must not be null")
    else
      // surface a malformed profile as a clean analysis error (the
      // function is public SQL surface): parse failures here would
      // otherwise escape later as raw exceptions from planning/codegen.
      // Forcing the lazy val (not a fresh parse) memoizes the work: the
      // analyzer calls this on every pass, and a successful parse is
      // shared with eval/codegen; a FAILED lazy init is un-cached by
      // Scala semantics, so the failure path still reports cleanly.
      try { table; TypeCheckResult.TypeCheckSuccess }
      catch { case e: IllegalArgumentException =>
        TypeCheckResult.TypeCheckFailure(e.getMessage) }

  private lazy val (table, nLangs, n) =
    NgramScores.parse(right.eval(null).asInstanceOf[ArrayData])

  override protected def nullSafeEval(text: Any, profiles: Any): Any =
    NgramScores.score(text.asInstanceOf[UTF8String], table, nLangs, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("ngramTable", table, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, (txt, _) =>
      s"${ev.value} = graft.functions.NgramScores.score($txt, $t, $nLangs, $n);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): NgramScore =
    copy(left = l, right = r)
}
