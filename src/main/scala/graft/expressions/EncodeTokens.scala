package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native vocabulary encoder: token array → (space-joined id string,
  * n_tokens, n_oov) in ONE generated loop with O(1) hash-map lookups
  * against a plan-time vocabulary (id 0 = out-of-vocabulary).
  *
  * Why a custom `Expression` (extension tier (b), same design as
  * [[UnigramScore]]): the declarative form is `transform(tokens, t ->
  * coalesce(element_at(map, t), 0))` + a cast `transform` +
  * `array_join` + a `filter` for the OOV count — four interpreted HOF
  * passes, and `element_at` on an `ArrayBasedMapData` LINEAR-SCANS the
  * vocabulary per token, making encoding O(tokens × k) per document.
  * Here the bounded vocabulary (collected once at plan build, the same
  * driver-side class as a broadcast) sits in a real hash map and the
  * id string is built in one append pass.
  *
  * Bit-compatibility contract (spec'd equal to the HOF formulation;
  * the encode DuckDB oracle re-proves it per round): ids print exactly
  * as Spark's long→string cast (`Long.toString`), joined by single
  * spaces with no trailing separator; empty arrays encode to ('', 0,
  * 0); null elements cannot occur (the tokenizer never emits them)
  * but would count as OOV like the HOF's null-propagating lookup.
  */
case class EncodeTokens(child: Expression, vocab: Map[String, Long])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("token_ids", StringType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_oov", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }

  override def prettyName: String = "encode_tokens"

  /** UTF8String-keyed map: lookups need no per-token decode. */
  @transient private lazy val lookup: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (t, id) => m.put(UTF8String.fromString(t), id) }
    m
  }

  override def nullSafeEval(input: Any): Any =
    EncodeTokens.encode(input.asInstanceOf[ArrayData], lookup)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("encodeVocab", lookup,
      classOf[java.util.HashMap[UTF8String, java.lang.Long]].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.EncodeTokens.encode($a, $mapRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): EncodeTokens =
    copy(child = newChild)
}

object EncodeTokens {

  /** The encoder — static so generated code and interpreted eval share
    * one implementation (the loop body is map lookups and digit
    * appends; what matters is skipping four HOF passes and the linear
    * map scans).
    */
  def encode(arr: ArrayData,
      lookup: java.util.HashMap[UTF8String, java.lang.Long]): InternalRow = {
    val n = arr.numElements()
    val sb = new java.lang.StringBuilder(n * 3)
    var oov = 0L
    var i = 0
    while (i < n) {
      val id = if (arr.isNullAt(i)) null else lookup.get(arr.getUTF8String(i))
      val v = if (id == null) 0L else id.longValue()
      if (v == 0L) oov += 1L
      if (i > 0) sb.append(' ')
      sb.append(v)
      i += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(sb.toString), n.toLong, oov))
  }

  def apply(tokens: Column, vocab: Map[String, Long]): Column =
    ColumnBridge.column(
      EncodeTokens(ColumnBridge.expression(tokens), vocab))
}
