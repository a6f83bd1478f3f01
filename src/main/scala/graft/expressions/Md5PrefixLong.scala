package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native md5-prefix hash: the first `digits` hex characters of
  * `md5(s)` as a non-negative long, computed straight from the digest
  * bytes.
  *
  * Why a custom `Expression` (extension tier (b)): the declarative
  * form — `conv(substring(md5(s), 1, digits), 16, 10) cast long` —
  * hex-encodes the 16-byte digest into a 32-char string, substrings it
  * (second allocation), and re-parses the prefix base-16. That chain
  * runs once per POSTING in every hash-keyed operator (minhash
  * signatures, shingle/k-gram postings, draw coordinates, sketch
  * keys), so the corpus-scale operators pay millions of throwaway
  * string allocations per scan. Here the digest's leading bytes fold
  * directly into the long — no hex string, no parse.
  *
  * Bit-compatibility contract (ScalaCheck'd equal to the conv-chain
  * in Md5PrefixLongProps; every consumer's DuckDB oracle re-proves it
  * end-to-end, since the oracle SQL keeps the textual
  * `CAST(conv(substring(md5(x), 1, d), 16, 10) AS BIGINT)` form): the
  * first d hex chars read as an unsigned base-16 number = the first
  * ⌈d/2⌉ digest bytes big-endian, shifted right one nibble when d is
  * odd. `digits` ≤ 15 keeps the value strictly positive in a long
  * (≤ 60 bits). Null input → null, like md5.
  */
case class Md5PrefixLong(child: Expression, digits: Int)
    extends UnaryExpression {

  require(digits >= 1 && digits <= 15,
    s"md5_prefix_long supports 1..15 hex digits (60 bits), got $digits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.sql}")
  }

  override def nullable: Boolean = true

  override def prettyName: String = "md5_prefix_long"

  override def nullSafeEval(input: Any): Any =
    Md5PrefixLong.prefix(input.asInstanceOf[UTF8String], digits)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expressions.Md5PrefixLong.prefix($s, $digits);")

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixLong =
    copy(child = newChild)
}

object Md5PrefixLong {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Digest the UTF-8 bytes and fold the leading nibbles — static so
    * generated code and interpreted eval share one implementation.
    */
  def prefix(s: UTF8String, digits: Int): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(s.getBytes)
    val nBytes = (digits + 1) / 2
    var acc = 0L
    var i = 0
    while (i < nBytes) {
      acc = (acc << 8) | (dig(i) & 0xffL)
      i += 1
    }
    if ((digits & 1) == 1) acc >>>= 4
    acc
  }

  def apply(s: Column, digits: Int): Column =
    ColumnBridge.column(Md5PrefixLong(ColumnBridge.expression(s), digits))
}
