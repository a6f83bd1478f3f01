package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: character-distribution accumulators of a string
  * in one pass — `[#code points, Shannon entropy (nats), #distinct
  * code points]`. Low entropy flags repeated-character runs and
  * keyboard mash; high entropy flags base64/hex blobs — the classic
  * cheap gibberish screen riding next to the token-level quality
  * features (used by Dolma/RedPajama-class filter stacks).
  *
  * Why a custom `Expression` (extension tier (b), like
  * [[UnigramScore]]): the declarative form needs a per-document
  * character histogram — an explode to (doc, char) rows plus TWO
  * aggregates, i.e. a token-scale shuffle for what is a pure per-row
  * quantity. Here the histogram lives in a per-row sorted map and the
  * corpus never shuffles.
  *
  * Cross-engine contract (re-proved by the `text_entropy` oracle every
  * round): the entropy fold runs over distinct code points in
  * ASCENDING CODE POINT order — which is also UTF-8 byte order, so
  * DuckDB's binary-collation `ORDER BY c` replays it — with
  * `acc -= p * StrictMath.log(p)` per step, `p = cnt / n` a single
  * IEEE division. `(-p)·ln p` vs `-(p·ln p)` are IEEE-identical (sign
  * flips are exact), so the oracle's term-wise formulation matches
  * bit-for-bit before the gate's 1e-6 floor-quantization.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got ${other.sql}")
    }

  override def prettyName: String = "char_entropy"

  /** One pass + one ordered fold; called from both eval and generated
    * code (a reference-object method call, the Pattern-holder idiom —
    * the loop body is not worth inlining into WSCG here because the
    * histogram map dominates, not call dispatch).
    */
  def fold(s: UTF8String): GenericArrayData = {
    val str = s.toString
    val counts = new java.util.TreeMap[Integer, Array[Long]]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1L)) else slot(0) += 1L
      n += 1L
      i += Character.charCount(cp)
    }
    var h = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next()(0).toDouble / n
      h -= p * StrictMath.log(p)
    }
    new GenericArrayData(
      Array[Any](n.toDouble, h, counts.size().toDouble))
  }

  override def nullSafeEval(input: Any): Any =
    fold(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charEntropy", this, classOf[CharEntropy].getName)
    nullSafeCodeGen(ctx, ev,
      s => s"${ev.value} = $ref.fold($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  def apply(text: Column): Column =
    ColumnBridge.column(CharEntropy(ColumnBridge.expression(text)))
}
