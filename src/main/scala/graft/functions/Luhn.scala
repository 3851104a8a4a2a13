package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Luhn checksum (ISO/IEC 7812) — the verification half of payment-card
  * PII detection. A regex alone cannot tell a card number from any
  * 16-digit string (order ids, tracking numbers — redacting those
  * destroys training signal for nothing); the Luhn check is the
  * standard second stage: double every second digit from the right,
  * subtract 9 from two-digit products, valid iff the sum ≡ 0 (mod 10).
  * Pure integer arithmetic — the oracle replays it relationally.
  */
object Luhn {

  /** True iff the string's DIGITS pass the Luhn check (any non-digit
    * bytes — the usual space/dash grouping — are skipped in place, so
    * callers pass the raw matched candidate). Fewer than 2 digits is
    * never valid (the degenerate "0" would otherwise pass). */
  def valid(s: UTF8String): Boolean = {
    val b = s.getBytes
    var sum = 0
    var parity = 0 // 0-based position from the RIGHT of the digit seen
    var i = b.length - 1
    var nDigits = 0
    while (i >= 0) {
      val c = b(i)
      if (c >= '0' && c <= '9') {
        var d = c - '0'
        if (parity % 2 == 1) { d *= 2; if (d > 9) d -= 9 }
        sum += d
        parity += 1
        nDigits += 1
      }
      i -= 1
    }
    nDigits >= 2 && sum % 10 == 0
  }
}

/** `graft_luhn(text)` → BOOLEAN: Luhn-checksum validity of the digits in
  * the string. Runs in compiled Scala invoked from generated code,
  * inside whole-stage codegen like the other graft expressions. */
case class LuhnValid(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got $t")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_luhn"

  override protected def nullSafeEval(in: Any): Any =
    Luhn.valid(in.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.Luhn.valid($in);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
