package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** HyperLogLog registers over a 48-bit hash column as ONE aggregation
  * — the constant-size companion to [[KmvBottomK]] (k longs, adaptive
  * accuracy) for distinct counting: 256 one-byte registers per group,
  * whatever the cardinality.
  *
  * Flajolet et al. 2007 layout on the md5-derived 48-bit hash the
  * engine already computes (`TextFeatures.hash48` — chosen so a SQL
  * oracle can reproduce every register): bucket = top 8 bits,
  * rho = 41 − bitlength(low 40 bits) (i.e. leading zeros within the
  * 40-bit window + 1; w = 0 → 41), register = max rho per bucket.
  * Register maxes merge losslessly (max of maxes), so partial
  * aggregation ships exactly 256 bytes per group per task and the
  * result is independent of partitioning — bit-identical to the
  * composable groupBy(bucket).max formulation, which is what the
  * `hll_distinct` oracle recomputes.
  *
  * Returns `struct<n_zero, s41, est_raw>`:
  *   - `s41` = Σ_b 2^(41 − M_b) — the harmonic denominator scaled by
  *     2^41, an EXACT integer ≤ 256·2^41 < 2^53 (each term is a power
  *     of two; empty buckets contribute 2^41), so the one double
  *     division in `est_raw = α_256·256²·2^41 / s41` is the only
  *     inexact step and is bit-identical cross-engine;
  *   - `est_raw` is the UNCORRECTED estimate: the low-cardinality
  *     linear-counting correction needs ln(256/n_zero), and ln is a
  *     libm call engines disagree on by ulps — callers apply it from
  *     `n_zero` when est_raw ≤ 2.5·256 (and below 256 distinct the
  *     KMV sketch is exact anyway).
  */
case class HllRegisters(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  import HllRegisters._

  override def prettyName: String = "hll_registers"

  override def dataType: DataType = StructType(Seq(
    StructField("n_zero", LongType, nullable = false),
    StructField("s41", LongType, nullable = false),
    StructField("est_raw", DoubleType, nullable = false)))

  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bucket = ((h >>> 40) & (M - 1)).toInt
      val w = h & ((1L << 40) - 1)
      val rho = (41 - (64 - java.lang.Long.numberOfLeadingZeros(w))).toByte
      if (rho > buf(bucket)) buf(bucket) = rho
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    var s41 = 0L
    var zeros = 0L
    var i = 0
    while (i < M) {
      s41 += 1L << (41 - buf(i))
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    InternalRow(zeros, s41, Alpha * (M.toDouble * M) * Pow41 / s41)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegisters =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): HllRegisters =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): HllRegisters =
    copy(child = newChild)
}

object HllRegisters {
  /** Register count (p = 8): standard error 1.04/√256 ≈ 6.5%. */
  val M = 256

  /** α_256 and 2^41, written as the same literal arithmetic the oracle
    * SQL spells out — every op is IEEE-deterministic, so the estimate
    * bits match cross-engine.
    */
  val Alpha: Double = 0.7213 / (1.0 + 1.079 / 256.0)
  val Pow41: Double = 2199023255552.0

  /** Column-API entry point over a 48-bit hash column. */
  def apply(h: Column): Column =
    ColumnBridge.column(
      HllRegisters(ColumnBridge.expression(h)).toAggregateExpression())
}
