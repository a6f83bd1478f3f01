package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native SimHash fingerprint: packs the signs of `bits` plane
  * projections of a numeric vector into `bits / 32` non-negative
  * 32-bit words (held in longs), MSB first — the
  * [[graft.similarity.BinaryQuant]] pack as ONE fused loop.
  *
  * Why a custom `Expression` (extension tier (b), the
  * [[NearestCentroid]] design): the declarative formulation — a
  * when-chain of `bits` separate [[DotProduct]] sub-trees — builds
  * `bits` codegen'd loops into every pack site, so plan size, janino
  * compile time, and (worse) the risk of Catalyst collapsing the whole
  * chain into a downstream join's per-PAIR projection all grow with
  * the fingerprint width. Here the plane matrix is a flat double[]
  * referenced by the generated code (shipped once in the task binary,
  * like a broadcast variable) and the pack is one tight bits×dim loop,
  * constant generated-source size in `bits`.
  *
  * Bit-compatibility contract with the literal path (spec'd in
  * BinaryQuantSpec): per plane the projection is the left-to-right
  * [[DotProduct]] fold (float elements widen exactly), the bit is
  * `dot > 0`, and bit j of word w weighs 2^(31−j). Null semantics:
  * null vector, a null element, or a dimension mismatch yield null.
  */
case class SignPackWords(child: Expression, flat: Seq[Double], bits: Int)
    extends UnaryExpression {

  require(bits > 0 && bits % 32 == 0, "bits must be a positive multiple of 32")
  require(flat.length % bits == 0, "plane matrix must be bits*dim flat")

  private def dim: Int = flat.length / bits

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${dt.sql}")
  }

  override def nullable: Boolean = true

  override def prettyName: String = "sign_pack_words"

  @transient private lazy val flatArr: Array[Double] = flat.toArray

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    SignPackWords.pack(v.asInstanceOf[ArrayData], isFloat, flatArr,
      bits, dim)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("spwFlat", flatArr, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("spwArr")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.expressions.SignPackWords.pack(
         |    $v, $isFloat, $flatRef, $bits, $dim);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): SignPackWords = copy(child = newChild)
}

object SignPackWords {

  /** The pack loop — static so generated and interpreted eval share one
    * implementation. Null on dimension mismatch or a null element.
    */
  def pack(v: ArrayData, isFloat: Boolean, flat: Array[Double],
      bits: Int, dim: Int): ArrayData = {
    if (v.numElements() != dim) return null
    val words = new Array[Long](bits / 32)
    var b = 0
    while (b < bits) {
      var dot = 0.0
      val base = b * dim
      var i = 0
      while (i < dim) {
        if (v.isNullAt(i)) return null
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        dot += x * flat(base + i)
        i += 1
      }
      if (dot > 0) words(b / 32) |= 1L << (31 - (b % 32))
      b += 1
    }
    new GenericArrayData(words)
  }

  /** Column entry point from a plane list (bits rows × dim columns). */
  def apply(vec: Column, planes: Seq[IndexedSeq[Double]]): Column =
    ColumnBridge.column(SignPackWords(ColumnBridge.expression(vec),
      planes.flatten.toIndexedSeq, planes.size))
}
