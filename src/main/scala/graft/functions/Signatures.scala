package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-pass sketch signatures over a hashed-token array.
  *
  * The composable formulation (64 × `array_min(transform(...))` /
  * 64 × `aggregate(...)`) walks the array 64 times through interpreted
  * lambdas; these expressions make one pass updating 64 registers, and
  * their loops live in compiled Scala invoked from generated code — the
  * signature cost is what scales with corpus size at 100 TB.
  *
  * Both reproduce the composed formulations bit-for-bit (same constants,
  * same affine maps, same tie behavior).
  */
object Signatures {
  val P: Long = 2147483647L // 2^31 - 1

  /** Seeded affine permutation coefficients: a odd with a < 2^32
    * (nextInt(Int.MaxValue-1)*2+1 ≤ 2^32-5), b < 2^31. Overflow headroom
    * for (a*hr + b) with hr ≤ P-1 = 2^31-2: max ≈ (2^32-5)·(2^31-2)+2^31
    * ≈ 2^63 - 2^33 < Long.MaxValue — safe, but only by ~2^33. */
  def perms(seed: Long = 42, n: Int = 64): (Array[Long], Array[Long]) = {
    val r = new scala.util.Random(seed)
    val ab = Array.fill(n)((r.nextInt(Int.MaxValue - 1).toLong * 2 + 1, r.nextInt(Int.MaxValue).toLong))
    (ab.map(_._1), ab.map(_._2))
  }

  /** MinHash: min over elements of (a_p * pmod(xxhash64(h), P) + b_p) mod P. */
  def minhash(in: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val k = a.length
    val mins = Array.fill(k)(Long.MaxValue)
    val n = in.numElements()
    var i = 0
    while (i < n) {
      val h = XXH64.hashLong(in.getLong(i), 42L)
      val hr = { val m = h % P; if (m < 0) m + P else m }
      var p = 0
      while (p < k) {
        val v = (a(p) * hr + b(p)) % P
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Winnowing fingerprint: min over rolling polynomial hashes of char
    * 4-grams (code points, matching split(text,"")+ascii semantics of the
    * composable ColumnFns.fingerprintFromChars — and DuckDB's
    * string_split+ord). One pass over the string; the composable form
    * walks a per-char array with 4 element lookups per window. Int math
    * (corpus is BMP text; same overflow envelope as the composable form). */
  def fingerprint(s: org.apache.spark.unsafe.types.UTF8String): java.lang.Integer = {
    val str = s.toString
    val len = str.length
    // rolling window of the last 4 code points
    var c0, c1, c2, c3 = 0
    var seen = 0
    var min = Int.MaxValue
    var i = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      c0 = c1; c1 = c2; c2 = c3; c3 = cp
      seen += 1
      if (seen >= 4) {
        val h = c0 * 29791 + c1 * 961 + c2 * 31 + c3
        if (h < min) min = h
      }
    }
    if (seen < 4) null else Integer.valueOf(min)
  }

  /** SimHash: bit j set iff elements with bit j outnumber those without. */
  def simhash(in: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = in.numElements()
    var i = 0
    while (i < n) {
      val h = in.getLong(i)
      var j = 0
      while (j < 64) {
        counts(j) += ((h >>> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (2 * counts(j) > n) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

trait HashArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<bigint>, got $t")
  }
}

/** 64-permutation MinHash signature of an array<long> of element hashes. */
case class MinHashSignature(child: Expression)
    extends UnaryExpression with HashArrayInput {
  private lazy val (aCoef, bCoef) = Signatures.perms()

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash64"

  override protected def nullSafeEval(in: Any): Any =
    Signatures.minhash(in.asInstanceOf[ArrayData], aCoef, bCoef)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val a = ctx.addReferenceObj("aCoef", aCoef, "long[]")
    val b = ctx.addReferenceObj("bCoef", bCoef, "long[]")
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.Signatures.minhash($in, $a, $b);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** One-pass rolling 4-gram min-hash fingerprint of a string (null when
  * the string has fewer than 4 code points). */
case class RollingFingerprint(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got $t")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_fingerprint"

  override protected def nullSafeEval(in: Any): Any =
    Signatures.fingerprint(in.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => s"""
      java.lang.Integer ${ev.value}_r = graft.functions.Signatures.fingerprint($in);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.intValue(); }
    """)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash of an array<long> of element hashes. */
case class SimHash(child: Expression)
    extends UnaryExpression with HashArrayInput {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(in: Any): Any =
    Signatures.simhash(in.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.Signatures.simhash($in);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
