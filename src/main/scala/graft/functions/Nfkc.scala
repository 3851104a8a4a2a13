package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFKC normalization for the text-cleanup pipeline: maps
  * compatibility variants (ligatures ﬁ→fi, full-width ＡＢＣ→ABC,
  * superscripts ²→2, roman numerals Ⅳ→IV, …) onto their canonical
  * forms so downstream tokenization / dedup / hashing treat visually
  * equivalent spellings as equal — the standard first step on a real
  * multilingual corpus. Pure JDK (`java.text.Normalizer`), no external
  * libs. */
object Nfkc {

  /** NFKC-normalize a UTF8String. Fast path: `Normalizer.isNormalized`
    * is a quick-check scan with no allocation, and real-world corpus
    * text is overwhelmingly already normalized (all of ASCII is), so
    * the common case returns the input untouched. */
  def normalize(s: UTF8String): UTF8String = {
    val t = s.toString
    if (java.text.Normalizer.isNormalized(t, java.text.Normalizer.Form.NFKC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFKC))
  }
}

/** `graft_nfkc(text)` → NFKC-normalized text. The normalization loop
  * runs in compiled Scala invoked from generated code, inside
  * whole-stage codegen like the other graft string expressions. */
case class NfkcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfkc"

  override protected def nullSafeEval(in: Any): Any =
    Nfkc.normalize(in.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.Nfkc.normalize($in);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
