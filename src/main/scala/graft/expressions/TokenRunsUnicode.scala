package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode tokenizer — the multilingual sibling of
  * [[TokenRuns]]: maximal runs of Unicode LETTERS (any script,
  * `Character.isLetter`) or ASCII digits, letters lowercased
  * code-point-wise (`Character.toLowerCase`), in one code-point scan.
  *
  * Contract (ScalaCheck'd in TokenRunsUnicodeSpec): equivalent to
  * `regexp_extract_all(text, '[\p{L}]+|[0-9]+')` with each letter of
  * each match lowercased per code point. Two documented deltas from
  * the tempting `lower()`-then-regex form: code-point-wise lowering is
  * context-free (no Greek final sigma ς, which full-string `lower`
  * produces at word ends) and locale-free (no Turkish dotted-İ
  * surprises) — the context-sensitive mappings are exactly the ones
  * that make cross-engine hash determinism impossible, so the
  * tokenizer excludes them BY contract, not by accident.
  *
  * [[TokenRuns]] (ASCII runs, one byte scan) remains the right
  * tokenizer for the ASCII-contract operators and their oracles; this
  * one feeds the script-aware surfaces where CJK/Cyrillic text must
  * survive tokenization instead of dissolving into run separators.
  */
case class TokenRunsUnicode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.sql}")
  }

  override def prettyName: String = "token_runs_unicode"

  override def nullSafeEval(input: Any): Any =
    TokenRunsUnicode.scan(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.TokenRunsUnicode.scan($a);")

  override protected def withNewChildInternal(
      newChild: Expression): TokenRunsUnicode =
    copy(child = newChild)
}

object TokenRunsUnicode {

  def scan(s: UTF8String): GenericArrayData = {
    val str = s.toString
    val n = str.length
    val out = new java.util.ArrayList[UTF8String](8)
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      if (Character.isLetter(cp)) {
        sb.setLength(0)
        var j = i
        var c = cp
        while (j < n && Character.isLetter(c)) {
          sb.appendCodePoint(Character.toLowerCase(c))
          j += Character.charCount(c)
          c = if (j < n) str.codePointAt(j) else 0
        }
        out.add(UTF8String.fromString(sb.toString))
        i = j
      } else if (cp >= '0' && cp <= '9') {
        val start = i
        while (i < n && str.charAt(i) >= '0' && str.charAt(i) <= '9') i += 1
        out.add(UTF8String.fromString(str.substring(start, i)))
      } else i += Character.charCount(cp)
    }
    new GenericArrayData(out.toArray)
  }

  def apply(text: Column): Column =
    ColumnBridge.column(TokenRunsUnicode(ColumnBridge.expression(text)))
}
