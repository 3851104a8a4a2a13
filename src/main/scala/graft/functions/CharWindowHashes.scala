package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Fused sliding-window substring hashing for the CHARACTER tier of
  * substring dedup (r18 optimization round): one pass over the UTF-8
  * bytes producing `xxhash64` of every w-CODEPOINT window, byte-range
  * hashed in place.
  *
  * The column-algebra form this replaces —
  * `transform(sequence(1, n-(w-1)), i => substr(text, i, w))` exploded
  * and then `xxhash64(sh)` — allocates one w-char UTF8String PER
  * CHARACTER of the corpus and re-walks the string from byte 0 for
  * every `substr` call (substring-by-codepoint is O(i)), making the
  * d20 window emission O(len·w + len·i) allocations/walks per doc. One
  * codepoint-offset walk + one XXH64 call per window produces the
  * IDENTICAL longs: Spark's `xxhash64(string)` hashes the UTF-8 bytes
  * with seed 42, and a w-codepoint substring's bytes are exactly the
  * [start(i), start(i+w)) byte range of the parent — no copy needed.
  * HashedSpanSpec pins native == algebra hash-for-hash (incl.
  * multi-byte and supplementary codepoints).
  */
object CharWindowHashes {
  /** xxhash64(substr(s, i, w)) for i = 1..numChars-(w-1), in order. */
  def hashes(s: UTF8String, w: Int): ArrayData = {
    val nBytes = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numChars()
    val outLen = n - (w - 1)
    if (w <= 0 || outLen <= 0)
      return ArrayData.toArrayData(Array.empty[Long])
    val starts = new Array[Int](n + 1)
    var i = 0
    var b = 0
    while (b < nBytes) {
      starts(i) = b
      b += UTF8String.numBytesForFirstByte(Platform.getByte(base, off + b))
      i += 1
    }
    starts(n) = nBytes
    val out = new Array[Long](outLen)
    var j = 0
    while (j < outLen) {
      out(j) = XXH64.hashUnsafeBytes(base, off + starts(j),
        starts(j + w) - starts(j), 42L)
      j += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** `graft_char_window_hashes(text, w)` → array<long>: xxhash64 of every
  * w-codepoint sliding window of `text` (ascending start position).
  * Registered by GraftFunctions/GraftExtensions; Dedup.dupSpansChars'
  * hashed tier routes through it. */
case class CharWindowHashesExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, int), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_char_window_hashes"

  override protected def nullSafeEval(t: Any, w: Any): Any =
    CharWindowHashes.hashes(t.asInstanceOf[UTF8String], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, w) =>
      s"${ev.value} = graft.functions.CharWindowHashes.hashes($t, $w);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
