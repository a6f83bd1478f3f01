package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native one-pass SimHash signature of a shingle-set array: the
  * 32-bit sign-of-bit-sums signature in a single scan of the array.
  *
  * Why a custom `Expression` (extension tier (b)): the declarative
  * pipeline — explode the shingles into postings, md5-prefix-hash
  * each, `groupBy(doc_id).agg(sum(±1) × 32)` then pack sign bits —
  * pays a posting-level hash aggregate (a 32-column sum state probed
  * once per posting) plus a full exchange, reassembling per-doc
  * counters that were never apart. Here the 32 counters fold in one
  * int array during a single pass and the sign-pack follows. (Same
  * CollapseProject reasoning as [[MinHashBands]]: ONE expression,
  * ONE generator consumer, nothing re-inlines.)
  *
  * Bit-compatibility contract (mirrors the aggregate form exactly,
  * property-tested in SimHashSigProps; the dedup_simhash DuckDB
  * oracle re-proves it end-to-end with the explode/GROUP BY form):
  *   - per non-null element: h = [[Md5PrefixLong.prefix]](elem, 8)
  *     (the 32-bit md5 prefix); bit k of h set → +1 else −1;
  *   - per NULL element: −1 to every counter — exactly the aggregate
  *     form, where `when(shiftright(null,k)%2===1,1).otherwise(-1)`
  *     takes the otherwise branch;
  *   - signature bit k set iff counter_k > 0 (ties and negatives
  *     clear);
  *   - returns a 1-element array so `explode` drops empty/null inputs
  *     — the docs the exploded-postings aggregate produced no row for.
  */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }

  override def nullable: Boolean = true

  override def prettyName: String = "simhash_sig"

  override def nullSafeEval(input: Any): Any =
    SimHashSig.compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.expressions.SimHashSig.compute($c);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {

  val Bits = 32

  /** One pass: 32 sign counters in a local array, then the bit pack.
    * Static so generated code and interpreted eval share one
    * implementation. Null for empty input (the caller's explode then
    * emits no row).
    */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val counters = new Array[Int](Bits)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        var k = 0
        while (k < Bits) { counters(k) -= 1; k += 1 }
      } else {
        val h = Md5PrefixLong.prefix(arr.getUTF8String(i), 8)
        var k = 0
        while (k < Bits) {
          counters(k) += (if (((h >> k) & 1L) == 1L) 1 else -1)
          k += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < Bits) {
      if (counters(k) > 0) sig |= (1L << k)
      k += 1
    }
    new GenericArrayData(Array[Any](sig))
  }

  def apply(shingles: Column): Column =
    ColumnBridge.column(SimHashSig(ColumnBridge.expression(shingles)))
}
