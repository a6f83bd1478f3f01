package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst-Expression bridge.
  *
  * Spark 4's `Column` wraps a `ColumnNode`, and the converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`) are `private[sql]`,
  * so a library defining native catalyst expressions needs this shim in
  * an `org.apache.spark.sql` subpackage — the standard technique used
  * by third-party catalyst extensions. Nothing else in the engine
  * reaches into Spark internals.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Conservative (column, lo, hi) range extraction from a Column's
    * node graph — the manifest-pruning input of
    * [[graft.tables.StatsPredicate]]. Spark 4 Columns carry a LAZY
    * `ColumnNode` tree (`org.apache.spark.sql.internal`, `private[sql]`
    * — hence this shim): top-level `and`s decompose, simple
    * `col <op> literal` comparisons (either operand order) yield
    * ranges with `None` = unbounded, and any other shape yields
    * nothing (callers prune only on what IS recognized; strict bounds
    * are reported inclusive — conservatism is free, pruning may only
    * widen).
    */
  def simpleRanges(c: Column): Seq[(String, Option[Any], Option[Any])] = {
    import org.apache.spark.sql.internal.{ColumnNode, Literal, UnresolvedAttribute, UnresolvedFunction}
    def conjuncts(n: ColumnNode): Seq[ColumnNode] = n match {
      case f: UnresolvedFunction if f.functionName == "and" =>
        f.arguments.flatMap(conjuncts)
      case other => Seq(other)
    }
    object A {
      def unapply(n: ColumnNode): Option[String] = n match {
        case a: UnresolvedAttribute => a.nameParts.lastOption
        case _ => None
      }
    }
    object L {
      def unapply(n: ColumnNode): Option[Any] = n match {
        case l: Literal if l.value != null => Some(l.value)
        case _ => None
      }
    }
    conjuncts(c.node).flatMap {
      case f: UnresolvedFunction => (f.functionName, f.arguments) match {
        case ("=" | "==", Seq(A(n), L(v))) => Some((n, Some(v), Some(v)))
        case ("=" | "==", Seq(L(v), A(n))) => Some((n, Some(v), Some(v)))
        case (">" | ">=", Seq(A(n), L(v))) => Some((n, Some(v), None))
        case (">" | ">=", Seq(L(v), A(n))) => Some((n, None, Some(v)))
        case ("<" | "<=", Seq(A(n), L(v))) => Some((n, None, Some(v)))
        case ("<" | "<=", Seq(L(v), A(n))) => Some((n, Some(v), None))
        case _ => None
      }
      case _ => None
    }
  }

  /** [[simpleRanges]] over RESOLVED catalyst Expressions — the form a
    * `FileIndex.listFiles` receives as pushed data filters (round 16:
    * zone-map file pruning for the SQL path). Same conservative
    * contract: top-level `And`s decompose, simple
    * `attr <op> literal` comparisons yield inclusive ranges, anything
    * else yields nothing. Literal internal values convert to the
    * plain-Scala shapes the stats twins dispatch on (`UTF8String` →
    * `String`); exotic literal types drop (never-prune, conservative).
    */
  def simpleRangesResolved(filters: Seq[Expression])
      : Seq[(String, Option[Any], Option[Any])] = {
    import org.apache.spark.sql.catalyst.expressions._
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def cv(l: Literal): Option[Any] = l.value match {
      case null => None
      case u: org.apache.spark.unsafe.types.UTF8String =>
        Some(u.toString)
      case i: Int => Some(i)
      case lo: Long => Some(lo)
      case d: Double => Some(d)
      case f: Float => Some(f)
      case s: Short => Some(s)
      case b: Byte => Some(b)
      case _ => None
    }
    filters.flatMap(conjuncts).flatMap {
      case EqualTo(a: AttributeReference, l: Literal) =>
        cv(l).map(v => (a.name, Some(v): Option[Any], Some(v): Option[Any]))
      case EqualTo(l: Literal, a: AttributeReference) =>
        cv(l).map(v => (a.name, Some(v): Option[Any], Some(v): Option[Any]))
      case GreaterThan(a: AttributeReference, l: Literal) =>
        cv(l).map(v => (a.name, Some(v): Option[Any], None: Option[Any]))
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        cv(l).map(v => (a.name, Some(v): Option[Any], None: Option[Any]))
      case GreaterThan(l: Literal, a: AttributeReference) =>
        cv(l).map(v => (a.name, None: Option[Any], Some(v): Option[Any]))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        cv(l).map(v => (a.name, None: Option[Any], Some(v): Option[Any]))
      case LessThan(a: AttributeReference, l: Literal) =>
        cv(l).map(v => (a.name, None: Option[Any], Some(v): Option[Any]))
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        cv(l).map(v => (a.name, None: Option[Any], Some(v): Option[Any]))
      case LessThan(l: Literal, a: AttributeReference) =>
        cv(l).map(v => (a.name, Some(v): Option[Any], None: Option[Any]))
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        cv(l).map(v => (a.name, Some(v): Option[Any], None: Option[Any]))
      case _ => None
    }
  }

  /** TOTAL and EXACT range decomposition — `Some(ranges)` only when
    * the WHOLE predicate is a conjunction of NON-STRICT single-column
    * comparisons (`=`, `>=`, `<=`), `None` otherwise. Unlike
    * [[simpleRanges]] (conservative — strict ops widen, unrecognized
    * conjuncts drop), this is the SOUND direction a provable-match
    * audit needs: "every non-null value of the column satisfies the
    * conjunct" may only be claimed from ranges that mean exactly what
    * the predicate means.
    */
  def exactRangesTotal(
      c: Column): Option[Seq[(String, Option[Any], Option[Any])]] = {
    import org.apache.spark.sql.internal.{ColumnNode, Literal, UnresolvedAttribute, UnresolvedFunction}
    def conjuncts(n: ColumnNode): Seq[ColumnNode] = n match {
      case f: UnresolvedFunction if f.functionName == "and" =>
        f.arguments.flatMap(conjuncts)
      case other => Seq(other)
    }
    object A {
      // TOP-LEVEL single-part names only: a dotted/nested reference
      // collapsed to its leaf could resolve against an unrelated
      // top-level column's stats — in the SOUND direction that must
      // be unrecognized, not guessed (review r16)
      def unapply(n: ColumnNode): Option[String] = n match {
        case a: UnresolvedAttribute if a.nameParts.size == 1 =>
          a.nameParts.headOption
        case _ => None
      }
    }
    object L {
      def unapply(n: ColumnNode): Option[Any] = n match {
        case l: Literal if l.value != null => Some(l.value)
        case _ => None
      }
    }
    val parsed = conjuncts(c.node).map {
      case f: UnresolvedFunction => (f.functionName, f.arguments) match {
        case ("=" | "==", Seq(A(n), L(v))) => Some((n, Option(v), Option(v)))
        case ("=" | "==", Seq(L(v), A(n))) => Some((n, Option(v), Option(v)))
        case (">=", Seq(A(n), L(v))) => Some((n, Option(v), None))
        case (">=", Seq(L(v), A(n))) => Some((n, None, Option(v)))
        case ("<=", Seq(A(n), L(v))) => Some((n, None, Option(v)))
        case ("<=", Seq(L(v), A(n))) => Some((n, Option(v), None))
        case _ => None
      }
      case _ => None
    }
    if (parsed.exists(_.isEmpty) || parsed.isEmpty) None
    else Some(parsed.flatten)
  }
}
