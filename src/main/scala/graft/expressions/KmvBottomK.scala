package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bottom-k DISTINCT aggregate — the KMV sketch state as ONE
  * aggregation instead of a distinct-shuffle + window pair.
  *
  * Why a custom aggregate (extension tier (b) — see README): the
  * composable form of the KMV sketch (`distinct()` then a
  * `row_number` window) shuffles every per-task distinct hash before
  * the k-row cut. This aggregate holds the k smallest distinct hashes
  * IN the aggregation buffer, so the map side sends exactly
  * min(k, per-task-distinct) longs per group per task through one
  * exchange — at 100 TB the shuffle shrinks from O(distinct values)
  * to O(k × groups × tasks). Bottom-k-distinct merges losslessly
  * (global bottom-k ⊆ union of per-partition bottom-k), so partial
  * aggregation is exact, and the result is bit-identical to the
  * composable form — the oracle cross-check stays meaningful.
  *
  * Runs under `ObjectHashAggregateExec` (no whole-stage codegen for
  * typed buffers — the per-row cost is one TreeSet probe of a
  * ≤k-element set, dwarfed by the upstream md5).
  *
  * Returns `struct<n_hashes: bigint, kth_hash: bigint>`; callers
  * derive the estimate `(k-1) * 2^48 / kth_hash` from it. Null inputs
  * are ignored (SQL aggregate convention); a group with only null
  * inputs yields an empty sketch (n_hashes = 0, kth_hash null).
  */
case class KmvBottomK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def prettyName: String = "kmv_bottom_k"

  override def dataType: DataType = StructType(Seq(
    StructField("n_hashes", LongType, nullable = false),
    StructField("kth_hash", LongType, nullable = true)))

  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // only insert when it would survive the cut: avoids churning the
      // set once it is saturated with smaller values
      if (buf.size < k) buf.add(h)
      else if (h < buf.last) { buf.add(h); if (buf.size > k) buf.pollLast() }
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (buf.size < k) buf.add(h)
      else if (h < buf.last) { buf.add(h); if (buf.size > k) buf.pollLast() }
      else return buf // other iterates ascending: the rest can't survive
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    InternalRow(buf.size.toLong, if (buf.isEmpty) null else buf.last.longValue())

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvBottomK =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvBottomK =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): KmvBottomK =
    copy(child = newChild)
}

object KmvBottomK {
  /** Column-API entry point: `KmvBottomK($"hash", 64)`. */
  def apply(h: Column, k: Int): Column =
    ColumnBridge.column(
      KmvBottomK(ColumnBridge.expression(h), k).toAggregateExpression())
}
