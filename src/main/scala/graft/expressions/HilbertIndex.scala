package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Hilbert-curve index of a 2-D point on the 2^16 × 2^16 grid — the
  * locality-preserving alternative to [[graft.operators.ZOrder]]'s
  * Morton interleave for data layout (the curve modern lakehouse
  * clustering uses): consecutive Hilbert indexes are ALWAYS adjacent
  * cells (Manhattan distance 1, spec'd), so a range of the sort key
  * covers one connected region, while the Z-curve's diagonal jumps
  * periodically split a file's key range across distant rectangles
  * and widen its min/max bounding box.
  *
  * Why a custom `Expression` (extension tier (b)): the standard
  * xy→d walk (16 iterations of quadrant extraction + conditional
  * reflection/swap — Hamilton's classic formulation) is data-dependent
  * per bit. As nested `when()` columns each iteration references the
  * previous x AND y twice, so the expression tree doubles per bit —
  * 2^16 nodes by the last iteration. Here it is a 16-step loop in one
  * codegen'd method; inputs are masked to 16 bits (callers quantize
  * wider domains with [[graft.operators.ZOrder.quantShift]], the
  * shared scale-aware shift).
  *
  * The DuckDB oracle replays the identical walk as 16 chained CTE
  * steps ([[HilbertIndex.walkSql]]) — pure integer arithmetic, so the
  * gate hash-verifies every index bit.
  */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got (${l.sql}, ${r.sql})")
    }

  override def nullable: Boolean = left.nullable || right.nullable

  override def prettyName: String = "hilbert_index"

  override def nullSafeEval(x: Any, y: Any): Any =
    HilbertIndex.index(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.expressions.HilbertIndex.index($x, $y);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HilbertIndex = copy(newLeft, newRight)
}

object HilbertIndex {

  val Bits = 16

  /** Hamilton's xy→d walk on the 2^Bits grid; inputs masked to Bits.
    * Static so generated and interpreted code share one
    * implementation.
    */
  def index(x0: Long, y0: Long): Long = {
    var x = x0 & ((1L << Bits) - 1)
    var y = y0 & ((1L << Bits) - 1)
    var d = 0L
    var s = 1L << (Bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant so the sub-curve's orientation lines up
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** The same walk as DuckDB SQL: 16 chained CTE steps over columns
    * (x, y, d), starting from a relation `src` providing 16-bit-masked
    * bigints `x` and `y` AND `d = 0` (plus any passthrough columns in
    * `keep`, carried through every step). Returns the CTE chain text
    * and the final step's name; read the index from its `d`.
    */
  def walkSql(src: String, keep: Seq[String]): (String, String) = {
    val ks = if (keep.isEmpty) "" else keep.mkString(", ", ", ", "")
    val steps = (Bits - 1 to 0 by -1).zipWithIndex.map { case (i, step) =>
      val s = 1L << i
      val prev = if (step == 0) src else s"h${step - 1}"
      // rx/ry recomputed inline (cheap) to keep each step one SELECT
      val rx = s"CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END"
      val ry = s"CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END"
      s"""h$step AS (SELECT
         |  CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1
         |      THEN ${s - 1} - y ELSE y END)
         |    ELSE x END AS x,
         |  CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1
         |      THEN ${s - 1} - x ELSE x END)
         |    ELSE y END AS y,
         |  d + ${s * s} * xor(3 * ($rx), $ry) AS d$ks
         |  FROM $prev)""".stripMargin
    }
    (steps.mkString(",\n"), s"h${Bits - 1}")
  }

  def apply(x: Column, y: Column): Column =
    ColumnBridge.column(HilbertIndex(
      ColumnBridge.expression(x), ColumnBridge.expression(y)))
}
