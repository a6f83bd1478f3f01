package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass MinHash band values: all `numBands` LSH band hashes
  * of a shingle-set array, in a single scan of the array.
  *
  * Why a custom `Expression` (extension tier (b)): the declarative
  * pipeline — explode the shingles into postings, md5-hash each, run a
  * `groupBy(doc_id).agg(min, min, ...)` signature aggregate, then
  * project per-band `md5(concat_ws(":", h_i, h_j))` — pays a
  * posting-level hash-aggregate (an UnsafeRow hash map probed once per
  * posting with a numHashes-column state) plus a full exchange per
  * relation JUST to bring per-doc minima back together, when the
  * shingle set is already array-valued on one row. Here the minima
  * fold in registers during one pass over the array and the band
  * hashes follow immediately — no explode, no hash map, no exchange.
  * (The `array_min(transform(...))`-per-seed form is NOT the answer:
  * CollapseProject re-inlines the transform subtree into every
  * consumer — measured 30× at sf0.1. This expression emits ALL bands
  * as ONE array consumed by ONE posexplode, so nothing re-inlines.)
  *
  * Bit-compatibility contract (mirrors the aggregate form exactly,
  * property-tested band-for-band in MinHashBandsProps; every consumer's
  * DuckDB oracle re-proves it end-to-end):
  *   - base hash: [[Md5PrefixLong.prefix]](shingle, 12) — null
  *     elements hash to null and are skipped, like `min` over a null;
  *   - seed i: (base * as(i) + bs(i)) & Mask48 (overflow-free — the
  *     multiplier is < 2^14, see [[graft.dedup.MinHashLSH.coeffs]]);
  *   - band j: lowercase-hex md5 of the decimal h-values joined by
  *     ":" with `concat_ws` null-skipping (a null min drops out, no
  *     doubled separator);
  *   - null or EMPTY input array → null (posexplode then emits no
  *     rows, exactly like explode-of-nothing feeding the aggregate);
  *     an all-null-elements array still emits bands of md5("") like
  *     the aggregate's all-null minima row did.
  */
case class MinHashBands(child: Expression, as: Seq[Long], bs: Seq[Long],
    numBands: Int, rowsPerBand: Int) extends UnaryExpression {

  require(as.length == numBands * rowsPerBand &&
    bs.length == numBands * rowsPerBand,
    s"need ${numBands * rowsPerBand} coefficient pairs, " +
      s"got ${as.length}/${bs.length}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }

  override def nullable: Boolean = true

  override def prettyName: String = "minhash_bands"

  @transient private lazy val asArr: Array[Long] = as.toArray
  @transient private lazy val bsArr: Array[Long] = bs.toArray

  override def nullSafeEval(input: Any): Any =
    MinHashBands.compute(input.asInstanceOf[ArrayData], asArr, bsArr,
      numBands, rowsPerBand)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("as", asArr, "long[]")
    val bsRef = ctx.addReferenceObj("bs", bsArr, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.expressions.MinHashBands.compute(
      |  $c, $asRef, $bsRef, $numBands, $rowsPerBand);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

object MinHashBands {

  private val Mask48: Long = (1L << 48) - 1

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  /** One pass: seed minima in registers, then the per-band md5s.
    * Static so generated code and interpreted eval share one
    * implementation. Returns null for empty input (caller generator
    * then emits no rows). -1 marks "no value yet": real minima are
    * 48-bit, so the sentinel is unreachable.
    */
  def compute(arr: ArrayData, as: Array[Long], bs: Array[Long],
      numBands: Int, rowsPerBand: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val numH = numBands * rowsPerBand
    val mins = new Array[Long](numH)
    java.util.Arrays.fill(mins, -1L)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val base = Md5PrefixLong.prefix(arr.getUTF8String(i), 12)
        var j = 0
        while (j < numH) {
          val v = (base * as(j) + bs(j)) & Mask48
          if (mins(j) == -1L || v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    val digest = md.get()
    val out = new Array[AnyRef](numBands)
    var b = 0
    while (b < numBands) {
      val sb = new java.lang.StringBuilder(20 * rowsPerBand)
      var r = 0
      while (r < rowsPerBand) {
        val m = mins(b * rowsPerBand + r)
        if (m != -1L) {
          if (sb.length() > 0) sb.append(':')
          sb.append(m)
        }
        r += 1
      }
      digest.reset()
      val dig = digest.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new Array[Char](32)
      var k = 0
      while (k < 16) {
        hex(2 * k) = HexDigits((dig(k) >> 4) & 0xf)
        hex(2 * k + 1) = HexDigits(dig(k) & 0xf)
        k += 1
      }
      out(b) = UTF8String.fromString(new String(hex))
      b += 1
    }
    new GenericArrayData(out)
  }

  def apply(shingles: Column, as: Seq[Long], bs: Seq[Long],
      numBands: Int, rowsPerBand: Int): Column =
    ColumnBridge.column(MinHashBands(ColumnBridge.expression(shingles),
      as, bs, numBands, rowsPerBand))
}
