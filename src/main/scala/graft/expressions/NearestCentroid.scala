package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native codebook-argmin: nearest centroid of a quantized vector,
  * with the whole k×dim codebook carried as ONE plan-time object
  * instead of k literal sub-trees.
  *
  * Why a custom `Expression` (extension tier (b), same design as
  * [[EncodeTokens]]): the literal formulation —
  * `least(struct(qn + cn_k − 2·dot(q, lit(c_k)), cid_k), ...)` over k
  * centroids — builds k [[DotProduct]] trees into the plan, so
  * analysis/optimization cost, codegen size, and janino compile time
  * all grow linearly in k. That caps the regime at coarse codebooks
  * (k ≲ a few hundred); the √N cells a 100 TB IVF or SemDeDup layout
  * needs (k in the thousands) are unreachable. Here the codebook is a
  * flat double[] referenced by the generated code (shipped to
  * executors once inside the task binary, exactly like a broadcast
  * variable), and assignment is one tight k×dim loop whose generated
  * source size is CONSTANT in k.
  *
  * Bit-compatibility contract with the literal path (ScalaCheck'd in
  * KMeansSpec, and every consumer's DuckDB oracle re-proves it
  * end-to-end): per centroid the distance is
  * `(qn + cn_k) − 2.0·dot(q, c_k)` with the dot accumulated
  * left-to-right — identical IEEE operand order to the literal
  * `DotProduct` fold — and the argmin breaks distance ties toward the
  * smaller centroid id, exactly the lexicographic `least(struct(d, c))`
  * policy. Null semantics: null vector, null norm, a null element, or
  * a dimension mismatch yield null (the literal path's null-poisoned
  * struct never matters to its consumers; this path makes the same
  * rows null outright).
  *
  * Output: struct(d: double, c: bigint) — the literal path's shape, so
  * call sites swap without change.
  */
case class NearestCentroid(left: Expression, right: Expression,
    cids: Seq[Long], cns: Seq[Double], flat: Seq[Double])
    extends BinaryExpression {

  require(cids.nonEmpty, "nearest_centroid needs at least one centroid")
  require(cids.length == cns.length && flat.length % cids.length == 0,
    "codebook arrays must agree: one norm per id, k*dim components")

  private def dim: Int = flat.length / cids.length

  override def dataType: DataType = StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("c", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, double), got ${l.sql}, ${r.sql}")
    }

  override def nullable: Boolean = true

  override def prettyName: String = "nearest_centroid"

  @transient private lazy val cidArr: Array[Long] = cids.toArray
  @transient private lazy val cnArr: Array[Double] = cns.toArray
  @transient private lazy val flatArr: Array[Double] = flat.toArray

  override def nullSafeEval(q: Any, qn: Any): Any =
    NearestCentroid.nearest(q.asInstanceOf[ArrayData],
      qn.asInstanceOf[Double], cidArr, cnArr, flatArr, dim)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cidsRef = ctx.addReferenceObj("ncCids", cidArr, "long[]")
    val cnsRef = ctx.addReferenceObj("ncCns", cnArr, "double[]")
    val flatRef = ctx.addReferenceObj("ncFlat", flatArr, "double[]")
    nullSafeCodeGen(ctx, ev, (q, qn) => {
      val r = ctx.freshName("ncRow")
      s"""
         |InternalRow $r = graft.expressions.NearestCentroid.nearest(
         |  $q, $qn, $cidsRef, $cnsRef, $flatRef, $dim);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)
}

object NearestCentroid {

  /** The argmin loop — static so generated code and interpreted eval
    * share one implementation. Returns null on dimension mismatch or a
    * null element (the expression's null contract).
    */
  def nearest(q: ArrayData, qn: Double, cids: Array[Long],
      cns: Array[Double], flat: Array[Double], dim: Int): InternalRow = {
    if (q.numElements() != dim) return null
    var bestD = 0.0
    var bestC = 0L
    var found = false
    var k = 0
    while (k < cids.length) {
      var dot = 0.0
      val base = k * dim
      var i = 0
      while (i < dim) {
        if (q.isNullAt(i)) return null
        dot += q.getDouble(i) * flat(base + i)
        i += 1
      }
      val d = (qn + cns(k)) - 2.0 * dot
      if (!found || d < bestD || (d == bestD && cids(k) < bestC)) {
        bestD = d; bestC = cids(k); found = true
      }
      k += 1
    }
    new GenericInternalRow(Array[Any](bestD, bestC))
  }

  /** Column entry point from parallel codebook slices. */
  def apply(q: Column, qn: Column, cids: Seq[Long], cns: Seq[Double],
      cvs: Seq[Array[Double]]): Column =
    ColumnBridge.column(NearestCentroid(
      ColumnBridge.expression(q), ColumnBridge.expression(qn),
      cids, cns, cvs.flatten.toIndexedSeq))
}
