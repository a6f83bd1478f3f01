package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native rolling document fingerprint: foldLeft over the tokens of
  * `split(lower(text), " ")` of `(acc * 31 + h(token)) mod P`, with
  * `h(token)` the first 24 bits of md5(token) — the whole
  * tokenize → per-token md5 → fold chain in ONE pass.
  *
  * Why a custom `Expression` (extension tier (b)): the declarative
  * form is `aggregate(transform(words, w -> conv(substring(md5(w), 1,
  * 6), 16, 10)), ...)` — two interpreted HOFs, and each md5 call
  * allocates a 32-char hex string only to read its first six
  * characters back as an integer. Here tokens are byte slices of the
  * lowered text (the [[WordShingles]] boundary scan), each hashed
  * directly through a reused `MessageDigest` whose first three output
  * BYTES are the same 24 bits the hex-prefix conversion extracts.
  *
  * Bit-compatibility contract (spec'd against the HOF formulation; the
  * fingerprint DuckDB oracle — an independent `list_reduce` chain —
  * re-proves it every round): fold order is token order, arithmetic is
  * exact 64-bit (acc < P ≈ 2^30, h < 2^24, so acc*31 + h < 2^35), and
  * null text yields null exactly like the HOF (`aggregate` over a null
  * array).
  */
case class RollingFingerprint(child: Expression, mod: Long)
    extends UnaryExpression {

  // the documented exact-arithmetic contract needs acc*31 + h < 2^63:
  // with h < 2^24 (6 md5 hex digits) that holds for mod ≤ 2^34; zero
  // or negative moduli would throw at eval time or emit negative
  // fingerprints, so reject them at construction (ApplyMerge-style)
  require(mod > 0 && mod <= (1L << 34),
    s"rolling_fingerprint modulus must be in (0, 2^34], got $mod")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.sql}")
  }

  override def prettyName: String = "rolling_fingerprint"

  override def nullSafeEval(input: Any): Any =
    RollingFingerprint.scan(input.asInstanceOf[UTF8String], mod)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.RollingFingerprint.scan($a, ${mod}L);")

  override protected def withNewChildInternal(
      newChild: Expression): RollingFingerprint = copy(child = newChild)
}

object RollingFingerprint {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def scan(s: UTF8String, mod: Long): Long = {
    val lowered = s.toLowerCase
    val bytes = lowered.getBytes
    val len = bytes.length
    val md = digest.get()
    var acc = 0L
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || bytes(i) == ' ') {
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        val h = ((d(0) & 0xffL) << 16) | ((d(1) & 0xffL) << 8) | (d(2) & 0xffL)
        acc = (acc * 31L + h) % mod
        start = i + 1
      }
      i += 1
    }
    acc
  }

  def apply(text: Column, mod: Long): Column =
    ColumnBridge.column(
      RollingFingerprint(ColumnBridge.expression(text), mod))
}
