package graft.expressions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed byte length of a string (zlib level 6, raw
  * stream) — the primitive under the compression-ratio quality signal
  * ([[graft.text.CompressionRatio]]): how well a document compresses
  * is a one-number proxy for its redundancy that needs no model, no
  * vocabulary, and no language assumption (the filter family used by
  * large public web-corpus curations alongside Gopher-style rules).
  *
  * Why a custom `Expression` (extension tier (b)): there is no
  * built-in compression function, and a Scala UDF would box every row
  * and close over a per-call Deflater. Here the codegen path calls
  * one static method and the Deflater is THREAD-LOCAL with `reset()`
  * between rows — one native zlib context per executor thread for the
  * whole scan.
  *
  * Determinism: zlib's DEFLATE at a fixed level is a deterministic
  * function of the input bytes — stable across rows, partitionings,
  * and runs on the same zlib build (spec-pinned by a driver-side
  * replay). NOT DuckDB-expressible, so consumers are spec-verified
  * rather than oracle-gated — documented at the consumer.
  */
case class DeflateLength(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.sql}")
  }

  override def nullable: Boolean = true

  override def prettyName: String = "deflate_length"

  override def nullSafeEval(input: Any): Any =
    DeflateLength.length(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expressions.DeflateLength.length($s);")

  override protected def withNewChildInternal(
      newChild: Expression): DeflateLength = copy(child = newChild)
}

object DeflateLength {

  private val local = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater =
      new Deflater(6, /* nowrap = raw stream, no zlib header */ true)
  }

  private val Buf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  /** Compressed size in bytes of the string's UTF-8 bytes. */
  def length(s: UTF8String): Long = {
    val d = local.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    val buf = Buf.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  def of(s: Column): Column =
    ColumnBridge.column(DeflateLength(ColumnBridge.expression(s)))
}
