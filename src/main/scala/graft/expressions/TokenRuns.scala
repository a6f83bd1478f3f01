package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenizer: maximal ASCII letter/digit runs, uppercase folded
  * — ONE byte scan replacing `regexp_extract_all(lower(text),
  * '[a-z]+|[0-9]+')` (which allocates a lowered copy of every row,
  * then runs a regex matcher over a decoded string).
  *
  * Contract (documented, spec'd): equivalent to the regex form for any
  * text whose `lower()` does not manufacture ASCII alphanumerics out
  * of non-ASCII characters. Multi-byte UTF-8 units have every byte ≥
  * 0x80, so they terminate runs exactly like punctuation — the single
  * exception is exotic case-folding (e.g. U+0130 lowercases to an
  * ASCII `i` + combining dot), where the regex form would emit a token
  * this scanner does not. Corpus-hygiene tokenization treats such
  * characters as noise either way; the per-query DuckDB oracles
  * (which keep the regex formulation) re-verify the equivalence on
  * real data every round.
  */
case class TokenRuns(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.sql}")
  }

  override def prettyName: String = "token_runs"

  override def nullSafeEval(input: Any): Any =
    TokenRuns.scan(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.TokenRuns.scan($a);")

  override protected def withNewChildInternal(newChild: Expression): TokenRuns =
    copy(child = newChild)
}

object TokenRuns {

  /** The scanner — static so generated code and interpreted eval share
    * one implementation (a 20-line loop gains nothing from inlined
    * codegen; what matters is skipping the regex machinery and the
    * full-row lowered copy).
    */
  def scan(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[UTF8String](8)
    var i = 0
    while (i < n) {
      val b = bytes(i)
      val isDigit = b >= '0' && b <= '9'
      val isAlpha = (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
      if (isDigit || isAlpha) {
        // extend the run over the same class (letters or digits)
        val start = i
        if (isDigit) {
          while (i < n && bytes(i) >= '0' && bytes(i) <= '9') i += 1
        } else {
          while (i < n && ((bytes(i) >= 'a' && bytes(i) <= 'z') ||
            (bytes(i) >= 'A' && bytes(i) <= 'Z'))) i += 1
        }
        val run = new Array[Byte](i - start)
        var j = 0
        while (j < run.length) {
          val c = bytes(start + j)
          run(j) = if (c >= 'A' && c <= 'Z') (c + 32).toByte else c
          j += 1
        }
        out.add(UTF8String.fromBytes(run))
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def apply(text: Column): Column =
    ColumnBridge.column(TokenRuns(ColumnBridge.expression(text)))
}
