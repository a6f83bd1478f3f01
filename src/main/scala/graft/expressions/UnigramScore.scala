package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: unigram-LM accumulators over a token
  * array in ONE codegen'd loop — `[Σ denom/smoothed(t), Σ -ln(smoothed
  * (t)/denom), #OOV]` with add-one smoothing against a plan-time
  * vocabulary.
  *
  * Why a custom `Expression` (extension tier (b), like [[DotProduct]]):
  * the declarative form is `aggregate(tokens, struct, ...)` over a map
  * column — higher-order functions evaluate INTERPRETED (lambda
  * dispatch per token) and `element_at` on an `ArrayBasedMapData`
  * LINEAR-SCANS the vocabulary per lookup. This expression holds the
  * bounded vocabulary (collected once at plan build, same driver-side
  * class as a broadcast) in a real hash map referenced from generated
  * code — O(1) lookups inside whole-stage codegen.
  *
  * Bit-compatibility contract: fold order is the token order, the log
  * is `StrictMath.log` — the SAME function Spark's `log()` evaluates —
  * and `acc -= log(x)` is IEEE-identical to `acc + (-log(x))`, so this
  * expression reproduces the interpreted formulation exactly (spec'd,
  * and the DuckDB oracle re-verifies it every round).
  */
case class UnigramScore(child: Expression, vocab: Map[String, Long],
    denom: Double) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${other.sql}")
    }

  override def prettyName: String = "unigram_score"

  /** UTF8String-keyed map: lookups need no per-token decode. */
  @transient private lazy val lookup: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (t, c) => m.put(UTF8String.fromString(t), c) }
    m
  }

  private def fold(arr: ArrayData): GenericArrayData = {
    var rar = 0.0
    var nll = 0.0
    var oov = 0L
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val cnt = if (arr.isNullAt(i)) null else lookup.get(arr.getUTF8String(i))
      val sm = if (cnt == null) 1.0 else cnt.doubleValue() + 1.0
      rar += denom / sm
      nll -= StrictMath.log(sm / denom)
      if (cnt == null) oov += 1L
      i += 1
    }
    new GenericArrayData(Array[Any](rar, nll, oov.toDouble))
  }

  override def nullSafeEval(input: Any): Any =
    fold(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("unigramVocab", lookup,
      classOf[java.util.HashMap[UTF8String, java.lang.Long]].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val rar = ctx.freshName("rar")
      val nll = ctx.freshName("nll")
      val oov = ctx.freshName("oov")
      val cnt = ctx.freshName("cnt")
      val sm = ctx.freshName("sm")
      s"""
         |final int $n = $a.numElements();
         |double $rar = 0.0; double $nll = 0.0; long $oov = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  java.lang.Long $cnt = $a.isNullAt($i) ? null
         |    : (java.lang.Long) $mapRef.get($a.getUTF8String($i));
         |  double $sm = $cnt == null ? 1.0 : $cnt.doubleValue() + 1.0;
         |  $rar += $denom / $sm;
         |  $nll -= java.lang.StrictMath.log($sm / $denom);
         |  if ($cnt == null) $oov += 1L;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  new Object[]{$rar, $nll, (double) $oov});
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramScore =
    copy(child = newChild)
}

object UnigramScore {
  def apply(tokens: Column, vocab: Map[String, Long], denom: Double): Column =
    ColumnBridge.column(
      UnigramScore(ColumnBridge.expression(tokens), vocab, denom))
}
