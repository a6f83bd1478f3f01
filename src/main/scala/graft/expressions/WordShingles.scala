package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word-shingle extractor: the distinct word n-grams of
  * `split(lower(text), " ")` in ONE byte scan over the lowered text.
  *
  * Why a custom `Expression` (extension tier (b), like [[DotProduct]]
  * and [[TokenRuns]]): the declarative form —
  * `array_distinct(transform(sequence(...), i -> concat_ws(" ",
  * element_at(w, i), ...)))` — is a higher-order function, and HOF
  * lambdas evaluate INTERPRETED: per gram it allocates a sequence
  * cell, dispatches the lambda, and evaluates n `element_at` calls
  * plus a `concat_ws`, all outside whole-stage codegen. Shingling is
  * the dominant scan cost of the whole dedup family (MinHash, SimHash,
  * n-gram Jaccard, decontamination, the curation pipelines), so it is
  * exactly the hot path the extension-tier rules say to nativize.
  *
  * The one-scan trick: tokens are `split(lower(text), " ")` — split on
  * a SINGLE literal space, empty tokens kept — so joining n adjacent
  * tokens with `" "` reproduces a byte SLICE of the lowered text:
  * gram(i) = lowered[start(i) .. start(i+n)-2] where start(k) is the
  * byte offset of token k (spaces are single ASCII bytes; every byte
  * of a multi-byte UTF-8 unit is >= 0x80, so a 0x20 scan cannot split
  * inside a character). No token objects, no join buffers — one
  * boundary scan plus one `UTF8String.fromBytes` slice per gram over a
  * shared byte array.
  *
  * Bit-compatibility contract (spec'd by `WordShinglesSpec` against
  * the HOF formulation, and re-verified by every shingle-consuming
  * DuckDB oracle each round):
  *   - lowering is `UTF8String.toLowerCase` — the SAME call Spark's
  *     `lower()` evaluates;
  *   - `distinct = true` keeps first occurrences in order, exactly
  *     `array_distinct` (binary equality);
  *   - texts with fewer than n tokens yield an empty array — matching
  *     the HOF form's `when(size(w) >= n, ...)` guard (the guard also
  *     maps null text to empty; [[graft.text.TextFeatures]] reproduces
  *     that at the Column layer, keeping this expression's null
  *     semantics standard).
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.sql}")
  }

  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.scan(input.asInstanceOf[UTF8String], n, distinct)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.WordShingles.scan($a, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  /** The scanner — static so generated code and interpreted eval share
    * one implementation (like [[TokenRuns.scan]]).
    */
  def scan(s: UTF8String, n: Int, distinct: Boolean): GenericArrayData = {
    val lowered = s.toLowerCase
    val bytes = lowered.getBytes
    val len = bytes.length
    var numTokens = 1
    var i = 0
    while (i < len) {
      if (bytes(i) == ' ') numTokens += 1
      i += 1
    }
    if (numTokens < n) return new GenericArrayData(Array.empty[Any])
    // start(k) = byte offset of token k; start(numTokens) = len + 1 so
    // the shared [start(i), start(i+n)-1) slice formula also covers
    // grams ending at the last token.
    val starts = new Array[Int](numTokens + 1)
    var t = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(numTokens) = len + 1
    val m = numTokens - n + 1
    if (distinct) {
      // LinkedHashSet = array_distinct: first occurrence wins, in order
      val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
      var k = 0
      while (k < m) {
        val off = starts(k)
        seen.add(UTF8String.fromBytes(bytes, off, starts(k + n) - 1 - off))
        k += 1
      }
      new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size())))
    } else {
      val arr = new Array[Any](m)
      var k = 0
      while (k < m) {
        val off = starts(k)
        arr(k) = UTF8String.fromBytes(bytes, off, starts(k + n) - 1 - off)
        k += 1
      }
      new GenericArrayData(arr)
    }
  }

  def apply(text: Column, n: Int, distinct: Boolean): Column =
    ColumnBridge.column(
      WordShingles(ColumnBridge.expression(text), n, distinct))
}
