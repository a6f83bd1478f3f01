package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native membership counter: how many elements of a string array are
  * in a small plan-time set — `size(filter(arr, x -> x.isin(set...)))`
  * as ONE codegen'd loop with O(1) hashed lookups.
  *
  * Why a custom `Expression` (extension tier (b), like [[DotProduct]]):
  * `filter` is a higher-order function — interpreted lambda dispatch
  * per token — and its `In` predicate is a linear scan of the set per
  * call. The stopword-ratio and language-ID features evaluate FIVE of
  * these per document (one per lexicon), making the interpreted form
  * the dominant cost of the quality/langid scan stage.
  *
  * Bit-compatibility contract (spec'd against the HOF form; the
  * quality/langid DuckDB oracles re-prove it every round): counts
  * binary-equal matches exactly like `In`; null elements never match
  * (the HOF's `filter` drops a null predicate result); result is the
  * same `int` that `size` returns.
  */
case class CountInSet(child: Expression, items: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }

  override def prettyName: String = "count_in_set"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](items.size * 2)
    items.foreach(i => s.add(UTF8String.fromString(i)))
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var cnt = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) cnt += 1
      i += 1
    }
    cnt
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("countInSet", set,
      classOf[java.util.HashSet[UTF8String]].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val cnt = ctx.freshName("cnt")
      s"""
         |final int $n = $a.numElements();
         |int $cnt = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) {
         |    $cnt++;
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CountInSet =
    copy(child = newChild)
}

object CountInSet {
  def apply(arr: Column, items: Seq[String]): Column =
    ColumnBridge.column(CountInSet(ColumnBridge.expression(arr), items))
}
