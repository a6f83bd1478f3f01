package graft.expressions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch as ONE bounded-memory aggregation
  * — the candidate-generation pass of exact distributed heavy hitters
  * (see [[graft.operators.HeavyHitters]]).
  *
  * Why a custom aggregate (extension tier (b) — see README): the exact
  * frequency table (`groupBy(item).count()`) shuffles one row per
  * DISTINCT item — at 100 TB of n-gram postings that is the full
  * vocabulary through the wire just to keep its heaviest sliver. This
  * sketch holds at most `k` counters IN the aggregation buffer: each
  * map task ships ≤ k (item, count) pairs per group through one
  * exchange regardless of how many distinct items it saw.
  *
  * Deficit guarantee (Misra-Gries 1982; merge per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): every counter decrement event
  * retires ≥ k+1 occurrences (update: k decrements + the arriving
  * item; merge: the subtracted offset times ≥ k+1 surviving-or-dropped
  * counters), so across any tree of merges
  *
  *   c(x) - n/(k+1)  <=  c̃(x)  <=  c(x)
  *
  * for every item x (c̃ = 0 when absent), where n is the TOTAL input
  * count. Hence any item with c(x) > n/(k+1) is guaranteed present —
  * with k+1 > denom, the sketch is a LOSSLESS screen for the
  * "share > 1/denom" heavy set, and an exact second pass over the ≤ k
  * candidates recovers true counts. The summary CONTENT (which
  * sub-threshold items ride along, residual counts) is
  * partition-order dependent; only the guarantee is invariant — which
  * is why the operator never reports sketch counts, only sketch KEYS.
  *
  * Runs under `ObjectHashAggregateExec` (typed buffer — no whole-stage
  * codegen; the per-row cost is one hash-map probe). Null inputs are
  * ignored (SQL aggregate convention). Returns `map<string, bigint>`
  * of surviving items → residual (lower-bound) counts, keys emitted in
  * binary sort order so the result is deterministic given the merge
  * tree.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"MisraGries needs k >= 1 counters, got $k")

  override def prettyName: String = "misra_gries"

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String]
      buf.get(item) match {
        case Some(c) => buf(item) = c + 1L
        case None if buf.size < k =>
          // eval() may return a pointer into a reused row buffer —
          // copy before the key outlives this input row
          buf(item.clone()) = 1L
        case None =>
          // classic MG step: full map + unseen item retires k+1
          // occurrences (every counter once + the arriving item)
          buf.mapValuesInPlace((_, c) => c - 1L)
          buf.filterInPlace((_, c) => c > 0L)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (item, c) =>
      // keys from deserialize/update are already private copies
      buf(item) = buf.getOrElse(item, 0L) + c
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from everything and drop
      // non-positives: ≤ k survivors, and the subtracted mass is
      // charged to ≥ k+1 counters so the n/(k+1) deficit bound holds
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - 1 - k)
      buf.mapValuesInPlace((_, c) => c - d)
      buf.filterInPlace((_, c) => c > 0L)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val keys = buf.keys.toArray.sortWith(_.compareTo(_) < 0)
    new ArrayBasedMapData(
      new GenericArrayData(keys.asInstanceOf[Array[Any]]),
      new GenericArrayData(keys.map(buf(_): Any)))
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val b = item.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf(UTF8String.fromBytes(b)) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

object MisraGries {
  /** Column-API entry point: `MisraGries($"token", 320)`. */
  def apply(item: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(item), k).toAggregateExpression())
}
