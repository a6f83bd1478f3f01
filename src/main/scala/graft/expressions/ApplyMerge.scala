package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge pass: in a space-separated symbol sequence, every
  * adjacent (left, right) symbol pair becomes the concatenated symbol,
  * greedily left-to-right without overlap — textbook byte-pair-encoding
  * apply. `"a a a"` under merge (a,a) → `"aa a"`: after a merge the
  * scan continues AFTER the consumed pair; the merged symbol can only
  * participate in the NEXT round's merges.
  *
  * Symbols never contain spaces (they are concatenations of tokenizer
  * output), so token boundaries are unambiguous and the whole pass is
  * one byte scan. The merge rule is a plan-time literal — each training
  * round collects its winning pair and embeds it in the next round's
  * plan (the k-means/PageRank iterative-literal pattern).
  *
  * The DuckDB oracle reproduces this exact greedy semantics with a
  * `list_reduce` whose string accumulator merges a trailing `left`
  * symbol when `right` arrives (spec'd equivalent; see
  * [[graft.text.BpeTrain]]).
  */
case class ApplyMerge(child: Expression, left: String, right: String)
    extends UnaryExpression {

  require(left.nonEmpty && right.nonEmpty, "merge symbols must be non-empty")
  require(!left.contains(' ') && !right.contains(' '),
    "merge symbols cannot contain the separator")

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.sql}")
  }

  override def prettyName: String = "apply_merge"

  @transient private lazy val leftBytes =
    left.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  @transient private lazy val rightBytes =
    right.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def nullSafeEval(input: Any): Any =
    ApplyMerge.scan(input.asInstanceOf[UTF8String], leftBytes, rightBytes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("mergeLeft", leftBytes, "byte[]")
    val r = ctx.addReferenceObj("mergeRight", rightBytes, "byte[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.ApplyMerge.scan($a, $l, $r);")
  }

  override protected def withNewChildInternal(newChild: Expression): ApplyMerge =
    copy(child = newChild)
}

object ApplyMerge {

  private def tokenAt(bytes: Array[Byte], start: Int, end: Int,
      tok: Array[Byte]): Boolean = {
    if (end - start != tok.length) return false
    var i = 0
    while (i < tok.length) {
      if (bytes(start + i) != tok(i)) return false
      i += 1
    }
    true
  }

  /** The pass — static so generated code and interpreted eval share one
    * implementation.
    */
  def scan(s: UTF8String, left: Array[Byte], right: Array[Byte]): UTF8String = {
    val bytes = s.getBytes
    val len = bytes.length
    val out = new Array[Byte](len)
    var o = 0
    var start = 0 // current token start
    var merged = false
    var i = 0
    while (i <= len) {
      if (i == len || bytes(i) == ' ') {
        // token = [start, i); if it is `left` and the NEXT token is
        // `right`, emit the concatenation and consume both
        var consumedNext = false
        if (i < len && tokenAt(bytes, start, i, left)) {
          var nStart = i + 1
          var nEnd = nStart
          while (nEnd < len && bytes(nEnd) != ' ') nEnd += 1
          if (tokenAt(bytes, nStart, nEnd, right)) {
            if (o > 0) { out(o) = ' '; o += 1 }
            System.arraycopy(bytes, start, out, o, i - start); o += i - start
            System.arraycopy(bytes, nStart, out, o, nEnd - nStart)
            o += nEnd - nStart
            start = nEnd + 1
            i = nEnd // loop increment moves past the boundary
            consumedNext = true
            merged = true
          }
        }
        if (!consumedNext) {
          if (o > 0) { out(o) = ' '; o += 1 }
          System.arraycopy(bytes, start, out, o, i - start); o += i - start
          start = i + 1
        }
      }
      i += 1
    }
    if (!merged) s else UTF8String.fromBytes(out, 0, o)
  }

  def apply(seq: Column, left: String, right: String): Column =
    ColumnBridge.column(
      ApplyMerge(ColumnBridge.expression(seq), left, right))
}
