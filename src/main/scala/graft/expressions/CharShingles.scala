package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native character-n-gram extractor: ALL length-n character windows of
  * `lower(text)` (multiplicity kept — the heavy-hitter families count
  * occurrences) in ONE pass, replacing the interpreted HOF
  * `transform(sequence(1, length(t)-(n-1)), i -> substr(t, i, n))`,
  * which re-walks the string from the front on EVERY `substr` call
  * (UTF-8 is variable-width, so char-indexed substring is O(i)) —
  * O(len²) per row, plus a lambda dispatch per gram.
  *
  * One pass: record each character's starting byte offset (stepping by
  * `UTF8String.numBytesForFirstByte`, the same walk `length()` and
  * `substr` take), then every gram is the byte slice
  * [off(i), off(i+n)) of a shared byte array.
  *
  * Bit-compatibility contract (spec'd against the HOF form, re-proved
  * by the heavy-hitter DuckDB oracles every round): lowering is
  * `UTF8String.toLowerCase` — the SAME call `lower()` evaluates — and
  * texts shorter than n characters yield an empty array, matching the
  * HOF `when(length(t) >= n, ...)` guard (which also maps null text to
  * empty; [[graft.text.TextFeatures]] reproduces that at the Column
  * layer).
  */
case class CharShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.sql}")
  }

  override def prettyName: String = "char_shingles"

  override def nullSafeEval(input: Any): Any =
    CharShingles.scan(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.CharShingles.scan($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}

object CharShingles {

  def scan(s: UTF8String, n: Int): GenericArrayData = {
    val lowered = s.toLowerCase
    val bytes = lowered.getBytes
    val len = bytes.length
    // off(k) = starting byte offset of character k; off(numChars) = len
    val offs = new Array[Int](len + 1)
    var numChars = 0
    var i = 0
    while (i < len) {
      offs(numChars) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      numChars += 1
    }
    offs(numChars) = len
    if (numChars < n) return new GenericArrayData(Array.empty[Any])
    val m = numChars - n + 1
    val arr = new Array[Any](m)
    var k = 0
    while (k < m) {
      val off = offs(k)
      arr(k) = UTF8String.fromBytes(bytes, off, offs(k + n) - off)
      k += 1
    }
    new GenericArrayData(arr)
  }

  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(CharShingles(ColumnBridge.expression(text), n))
}
