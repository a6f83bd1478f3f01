package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native floored residual to a codebook centroid:
  * `floor(q(i) − cv_cell(i))` per component, with the whole codebook
  * carried as ONE plan-time flat array (the [[NearestCentroid]]
  * design — shipped to executors in the task binary like a broadcast
  * variable, constant generated-code size in the cell count).
  *
  * Why a custom `Expression` (the repo's interpreted-HOF discipline,
  * SURVEY §14): the declarative formulation —
  * `zip_with(q, element_at(<literal cell→centroid map>, cell),
  * (a, b) => floor(a − b))` — evaluates the lambda INTERPRETED, one
  * dispatch per component per row, on a corpus-scale scan (the
  * residual-IVFADC coding path runs it twice over every document).
  * Here the loop is one codegen'd pass. The HOF stays as the spec'd
  * reference formulation, ScalaCheck'd equal in FloorResidualProps,
  * and every consumer's DuckDB oracle re-proves the arithmetic
  * end-to-end (`floor(a.q[i] - c.cv[i])`).
  *
  * Contract mirrored from the HOF form: null vector or null cell id →
  * null; unknown cell id → null (element_at's missing-key NULL
  * poisons zip_with); a null ELEMENT → null element in the result.
  * Dimension mismatch → null row (the HOF pads with nulls instead —
  * the engine only ever feeds dim-length arrays, and the gate pins
  * real behavior).
  */
case class FloorResidual(left: Expression, right: Expression,
    cids: Seq[Long], flat: Seq[Double])
    extends BinaryExpression {

  require(cids.nonEmpty && flat.length % cids.length == 0,
    "codebook arrays must agree: k cell ids, k*dim components")

  private def dim: Int = flat.length / cids.length

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, bigint), got ${l.sql}, ${r.sql}")
    }

  override def nullable: Boolean = true

  override def prettyName: String = "floor_residual"

  @transient private lazy val cidArr: Array[Long] = cids.toArray
  @transient private lazy val flatArr: Array[Double] = flat.toArray

  override def nullSafeEval(q: Any, cell: Any): Any =
    FloorResidual.compute(q.asInstanceOf[ArrayData],
      cell.asInstanceOf[Long], cidArr, flatArr, dim)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cidsRef = ctx.addReferenceObj("frCids", cidArr, "long[]")
    val flatRef = ctx.addReferenceObj("frFlat", flatArr, "double[]")
    nullSafeCodeGen(ctx, ev, (q, cell) => {
      val r = ctx.freshName("frArr")
      s"""
         |ArrayData $r = graft.expressions.FloorResidual.compute(
         |  $q, $cell, $cidsRef, $flatRef, $dim);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloorResidual =
    copy(left = newLeft, right = newRight)
}

object FloorResidual {

  /** One floored-subtraction pass — static so generated and
    * interpreted eval share it. Returns null for an unknown cell id or
    * a dimension mismatch; per-element nulls stay element-nulls.
    */
  def compute(q: ArrayData, cell: Long, cids: Array[Long],
      flat: Array[Double], dim: Int): ArrayData = {
    if (q.numElements() != dim) return null
    var k = -1
    var i = 0
    while (k < 0 && i < cids.length) {
      if (cids(i) == cell) k = i
      i += 1
    }
    if (k < 0) return null
    val base = k * dim
    val out = new Array[Any](dim)
    i = 0
    while (i < dim) {
      if (!q.isNullAt(i))
        out(i) = math.floor(q.getDouble(i) - flat(base + i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column entry point from a codebook's parallel slices. */
  def apply(q: Column, cell: Column, cids: Seq[Long],
      cvs: Seq[Array[Double]]): Column =
    ColumnBridge.column(FloorResidual(
      ColumnBridge.expression(q), ColumnBridge.expression(cell),
      cids, cvs.flatten.toIndexedSeq))
}
