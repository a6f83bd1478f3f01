package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native codebook-distance table: `cid → (qn + cn_k) − 2·dot(q, c_k)`
  * for EVERY centroid of a codebook, as one `map<bigint, double>` —
  * the ADC lookup table (and coarse probe-distance table) of the
  * [[graft.similarity.IvfPq]] / [[graft.similarity.ProductQuant]]
  * query side.
  *
  * Why a custom `Expression` (same tier-(b) rationale as
  * [[NearestCentroid]], which covers the argmin half of this
  * arithmetic): the literal formulation — `map_from_arrays(array(
  * lit(cid)...), array(qn + cn_k − 2·DotProduct(q, lit(c_k))...))` —
  * plants k DotProduct trees PER SUBSPACE into the plan, so with m
  * subspaces every probe projection carries m·k fold trees through
  * analysis, optimization and janino. Measured on the sf0.1 IVFADC
  * bench slot, that platform cost (a ~0.5 s driver-side gap before
  * the probe job) rivals the actual execution. Here the codebook is a
  * flat double[] referenced by the generated code and the whole table
  * is one k×dim loop — constant plan size in k, the large-k regime.
  *
  * Bit-compatibility: per centroid the distance is
  * `(qn + cn_k) − 2.0·dot(q, c_k)` with the dot accumulated
  * left-to-right — IDENTICAL IEEE operand order to the literal
  * `DotProduct` formulation it replaces (spec'd bit-equal in
  * IvfPqSpec), so every DuckDB oracle that replays the literal
  * arithmetic keeps hash-matching. Map keys follow codebook order
  * (the literal `map_from_arrays` contract); consumers either look up
  * by key (`element_at`) or re-sort exploded entries, so entry order
  * is never load-bearing. Null semantics: null vector, null norm,
  * null element, or dimension mismatch → null map (the literal path
  * null-poisons the same rows).
  */
case class CentroidDistMap(left: Expression, right: Expression,
    cids: Seq[Long], cns: Seq[Double], flat: Seq[Double])
    extends BinaryExpression {

  require(cids.nonEmpty, "centroid_dist_map needs at least one centroid")
  require(cids.length == cns.length && flat.length % cids.length == 0,
    "codebook arrays must agree: one norm per id, k*dim components")

  private def dim: Int = flat.length / cids.length

  override def dataType: DataType =
    MapType(LongType, DoubleType, valueContainsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, double), got ${l.sql}, ${r.sql}")
    }

  override def nullable: Boolean = true

  override def prettyName: String = "centroid_dist_map"

  @transient private lazy val cidArr: Array[Long] = cids.toArray
  @transient private lazy val cnArr: Array[Double] = cns.toArray
  @transient private lazy val flatArr: Array[Double] = flat.toArray

  override def nullSafeEval(q: Any, qn: Any): Any =
    CentroidDistMap.table(q.asInstanceOf[ArrayData],
      qn.asInstanceOf[Double], cidArr, cnArr, flatArr, dim)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cidsRef = ctx.addReferenceObj("cdmCids", cidArr, "long[]")
    val cnsRef = ctx.addReferenceObj("cdmCns", cnArr, "double[]")
    val flatRef = ctx.addReferenceObj("cdmFlat", flatArr, "double[]")
    nullSafeCodeGen(ctx, ev, (q, qn) => {
      val m = ctx.freshName("cdmMap")
      s"""
         |MapData $m = graft.expressions.CentroidDistMap.table(
         |  $q, $qn, $cidsRef, $cnsRef, $flatRef, $dim);
         |if ($m == null) { ${ev.isNull} = true; } else { ${ev.value} = $m; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CentroidDistMap =
    copy(left = newLeft, right = newRight)
}

object CentroidDistMap {

  /** The k×dim distance loop — static so generated and interpreted
    * eval share one implementation. Null on dimension mismatch or a
    * null element.
    */
  def table(q: ArrayData, qn: Double, cids: Array[Long],
      cns: Array[Double], flat: Array[Double], dim: Int): MapData = {
    if (q.numElements() != dim) return null
    val ds = new Array[Any](cids.length)
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
      ds(k) = (qn + cns(k)) - 2.0 * dot
      k += 1
    }
    new ArrayBasedMapData(new GenericArrayData(cids),
      new GenericArrayData(ds))
  }

  /** Column entry point from parallel codebook slices. */
  def apply(q: Column, qn: Column, cids: Seq[Long], cns: Seq[Double],
      cvs: Seq[Array[Double]]): Column =
    ColumnBridge.column(CentroidDistMap(
      ColumnBridge.expression(q), ColumnBridge.expression(qn),
      cids, cns, cvs.flatten.toIndexedSeq))
}
