package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-script letter census: ONE code-point scan returning
  * (n_letters, n_cjk, n_hangul, n_cyrillic, n_greek, n_arabic) — the
  * input a script-aware language screen needs on a multilingual
  * corpus, where stopword lexicons are blind (CJK has no spaces to
  * tokenize on, Cyrillic tokens never hit a Latin lexicon).
  *
  * Why a custom `Expression` (extension tier (b)): the declarative
  * form is SIX `size(regexp_extract_all(text, '[range]'))` passes —
  * six regex machines over a decoded copy of every row. Here one scan
  * decodes each code point once and bumps counters.
  *
  * Range contract (mirrored textually by the oracle's regex ranges,
  * spec'd equal to the Spark-side regex formulation):
  * letters = `\p{L}` (`Character.isLetter`); cjk = U+3040–U+30FF
  * (kana) ∪ U+3400–U+4DBF ∪ U+4E00–U+9FFF (han); hangul =
  * U+AC00–U+D7A3; cyrillic = U+0400–U+04FF; greek = U+0370–U+03FF;
  * arabic = U+0600–U+06FF. The named ranges cover the dominant blocks
  * only (a screen, not a classifier); letters counts every script, so
  * ratios are well-defined on any input. Null text → null.
  */
case class ScriptCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_letters", LongType, nullable = false),
    StructField("n_cjk", LongType, nullable = false),
    StructField("n_hangul", LongType, nullable = false),
    StructField("n_cyrillic", LongType, nullable = false),
    StructField("n_greek", LongType, nullable = false),
    StructField("n_arabic", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.sql}")
  }

  override def prettyName: String = "script_counts"

  override def nullSafeEval(input: Any): Any =
    ScriptCounts.scan(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.ScriptCounts.scan($a);")

  override protected def withNewChildInternal(newChild: Expression): ScriptCounts =
    copy(child = newChild)
}

object ScriptCounts {

  /** The census loop — static so generated code and interpreted eval
    * share one implementation.
    */
  def scan(s: UTF8String): InternalRow = {
    val str = s.toString
    var letters = 0L; var cjk = 0L; var hangul = 0L
    var cyr = 0L; var greek = 0L; var arab = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      if (Character.isLetter(cp)) {
        letters += 1
        if ((cp >= 0x3040 && cp <= 0x30FF) ||
            (cp >= 0x3400 && cp <= 0x4DBF) ||
            (cp >= 0x4E00 && cp <= 0x9FFF)) cjk += 1
        else if (cp >= 0xAC00 && cp <= 0xD7A3) hangul += 1
        else if (cp >= 0x0400 && cp <= 0x04FF) cyr += 1
        else if (cp >= 0x0370 && cp <= 0x03FF) greek += 1
        else if (cp >= 0x0600 && cp <= 0x06FF) arab += 1
      }
      i += Character.charCount(cp)
    }
    new GenericInternalRow(Array[Any](letters, cjk, hangul, cyr, greek, arab))
  }

  def apply(text: Column): Column =
    ColumnBridge.column(ScriptCounts(ColumnBridge.expression(text)))
}
