package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document compressibility — the Gopher/RedPajama-class cheap
  * quality signal: templated spam and machine-generated boilerplate
  * compress far better than natural prose, and random noise far worse,
  * so `compressed bytes / raw bytes` catches both tails that rule-based
  * gates (c24) and diversity ratios (t17) miss. Pure JDK
  * (`java.util.zip.Deflater`), no external libs.
  */
object Compress {

  /** DEFLATE level: fixed (not a knob) so the signal is one reproducible
    * number per document — a level change would silently shift every
    * stored ratio under any incremental run. Level 6 is zlib's default
    * speed/density balance. */
  val Level = 6

  // One Deflater + scratch buffer per executor thread, reset between
  // documents: constructing a Deflater allocates a native zlib stream,
  // and doing that per ROW would dominate short-document cost at
  // corpus scale. Never call end() on these — thread death reclaims
  // the native state via the JDK cleaner.
  private val local =
    ThreadLocal.withInitial[(java.util.zip.Deflater, Array[Byte])](() =>
      (new java.util.zip.Deflater(Level, true), new Array[Byte](8192)))

  /** Compressed byte length of a document's UTF-8 bytes under raw
    * DEFLATE (nowrap — no zlib header/checksum: the 6 wrapper bytes are
    * constant noise that would bias short documents). Streams through a
    * fixed per-thread 8 KiB buffer — the compressed output is never
    * materialized, only counted, so memory per call is O(1) regardless
    * of document size. */
  def deflateLen(s: UTF8String): Long = {
    val (d, buf) = local.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}

/** `graft_deflate_len(text)` → compressed byte count (BIGINT). The
  * deflate loop runs in compiled Scala invoked from generated code,
  * inside whole-stage codegen like the other graft string expressions.
  * Engine-specific by nature (the byte count depends on the zlib build)
  * — consumers stage the counts for relational oracle replay, the c23
  * staged-count idiom; the gate DECISIONS made from the counts are pure
  * integer arithmetic and replay exactly. */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_deflate_len"

  override protected def nullSafeEval(in: Any): Any =
    Compress.deflateLen(in.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.Compress.deflateLen($in);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
