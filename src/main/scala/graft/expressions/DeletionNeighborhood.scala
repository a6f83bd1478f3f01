package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The ≤`maxDel`-deletion neighborhood of a string: every distinct
  * string reachable by deleting at most `maxDel` code points, the
  * string itself included — the blocking key set of the FastSS /
  * SymSpell dictionary-matching family (Bocek et al. 2007, "Fast
  * Similarity Search in Big Data").
  *
  * Screen theorem (ScalaCheck'd in DeletionNeighborhoodProps, restated
  * in [[graft.operators.SymDeleteJoin]]'s scaladoc): lev(s, t) ≤ d
  * implies the d-neighborhoods of s and t intersect — an optimal
  * alignment deletes the substituted + unmatched positions from each
  * side (≤ d of each) and lands both on the common subsequence. The
  * converse is NOT tight (sharing a variant only bounds lev by 2d), so
  * consumers re-verify candidates with `levenshtein`; the screen is a
  * lossless candidate generator, never the decision.
  *
  * Why a custom `Expression` (extension tier (b)): the declarative
  * d=1 form — `array_distinct(concat(array(s), transform(sequence(1,
  * length(s)), i -> concat(substring(s, 1, i-1), substring(s, i+1,
  * ...)))))` — allocates two substrings plus a concat per position and
  * re-walks the array for the distinct; d=2 squares that with a
  * flatten of nested transforms. Here one pass over the code points
  * builds each variant directly and a hash set dedups as it goes. The
  * doGenCode delegates to the static helper, so the call stays inside
  * whole-stage codegen like [[Md5PrefixLong]].
  *
  * Determinism: variants emit breadth-first (0 deletions, then 1, then
  * 2) in deletion-position order, first occurrence wins — but every
  * consumer explodes into a join + distinct, so only the SET matters.
  * Code-point (not UTF-16 char) deletion keeps the contract aligned
  * with DuckDB's character-indexed `substr`, which the oracles use to
  * restate the d=1 neighborhood.
  *
  * Cost note for planners: |neighborhood| is Θ(n^d / d!) for an
  * n-code-point string — 1 + n at d=1, 1 + n + n(n−1)/2 at d=2. The
  * d=1 regime is the one to ship at corpus scale; d=2 is for short
  * keys (names, SKUs), never documents.
  */
case class DeletionNeighborhood(child: Expression, maxDel: Int)
    extends UnaryExpression {

  require(maxDel >= 1 && maxDel <= 3,
    s"deletion_neighborhood supports 1..3 deletions, got $maxDel")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.sql}")
  }

  override def nullable: Boolean = true

  override def prettyName: String = "deletion_neighborhood"

  override def nullSafeEval(input: Any): Any =
    DeletionNeighborhood.variants(input.asInstanceOf[UTF8String], maxDel)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expressions.DeletionNeighborhood" +
        s".variants($s, $maxDel);")

  override protected def withNewChildInternal(
      newChild: Expression): DeletionNeighborhood = copy(child = newChild)
}

object DeletionNeighborhood {

  /** Breadth-first distinct ≤`maxDel`-deletion variants of `s`. */
  def variants(s: UTF8String, maxDel: Int): GenericArrayData = {
    val cps = s.toString.codePoints().toArray
    val seen = mutable.LinkedHashSet[String](new String(cps, 0, cps.length))
    var frontier: Seq[Array[Int]] = Seq(cps)
    var round = 0
    while (round < maxDel && frontier.nonEmpty) {
      val next = Seq.newBuilder[Array[Int]]
      frontier.foreach { v =>
        var i = 0
        while (i < v.length) {
          val del = new Array[Int](v.length - 1)
          System.arraycopy(v, 0, del, 0, i)
          System.arraycopy(v, i + 1, del, i, v.length - 1 - i)
          if (seen.add(new String(del, 0, del.length))) next += del
          i += 1
        }
      }
      frontier = next.result()
      round += 1
    }
    new GenericArrayData(seen.toArray.map(UTF8String.fromString))
  }

  def of(s: Column, maxDel: Int): Column =
    ColumnBridge.column(DeletionNeighborhood(ColumnBridge.expression(s), maxDel))
}
