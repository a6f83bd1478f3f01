package graft.plans

import graft.plans.SummaryCatalog.{Measure, Summary}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Optimizer rule: route aggregate queries over a base table to a
  * registered [[SummaryCatalog]] rollup — materialized-view answering
  * for exact aggregate containment. Users (and downstream tools)
  * keep issuing the natural query against the base table; when a
  * summary covers it, the plan scans kilobytes instead of the corpus.
  *
  * Fires ONLY when every condition holds (conservative, like
  * [[graft.expressions.RewriteDotProduct]]):
  *   - the aggregate's child is the base table's parquet scan, bare
  *     or under pure column pruning — any Filter/Join/expression in
  *     between disqualifies (a filtered aggregate is NOT contained in
  *     an unfiltered rollup);
  *   - every grouping expression is a plain column ⊆ the summary keys
  *     (strict subsets roll the summary up further — that is what
  *     per-key partials are for);
  *   - every aggregate call matches a registered measure: `count(1)`,
  *     `sum(col)` / `sum(cast(col as t))` with the registered cast,
  *     `min(col)`, `max(col)`; no DISTINCT, no FILTER clauses.
  *     Post-aggregation scalar expressions (casts, arithmetic over
  *     the aggregates — e.g. a derived average sum/count) are fine:
  *     the rewrite happens inside them.
  *
  * Answer fidelity: re-aggregation is sum→sum, count→sum(cnt) (
  * coalesced to 0 so an empty base still answers a global count),
  * min→min, max→max — each exact for the measure types the catalog
  * admits, so the rewritten query is HASH-identical to the direct
  * one, which the `q_mv_rollup` oracle re-proves every round. Output
  * attribute ids and types are preserved (re-aggregated decimals cast
  * back to the original result type), so parent operators are
  * untouched.
  */
case class SummaryRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg: Aggregate => rewrite(agg).getOrElse(agg)
  }

  /** The scan under pure column pruning, if this subtree is one. */
  private def scanOf(plan: LogicalPlan): Option[LogicalRelation] = plan match {
    case p @ Project(projectList, child)
        if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      scanOf(child)
    case lr: LogicalRelation => Some(lr)
    case _ => None
  }

  private def summaryFor(lr: LogicalRelation): Option[Summary] =
    lr.relation match {
      case hfs: HadoopFsRelation =>
        hfs.location.rootPaths.toSeq match {
          // refuse a summary that would route a scan to ITSELF (a
          // registration with basePath == summaryPath) — a rewrite
          // loop in the best case, a read-own-overwrite in the worst
          case Seq(root) =>
            val p = root.toUri.getPath
            SummaryCatalog.lookup(p).filterNot(s =>
              SummaryCatalog.normalize(s.summaryPath) ==
                SummaryCatalog.normalize(p))
          case _ => None
        }
      case _ => None
    }

  /** The measure matching `Sum`'s child, if registered: a bare column
    * or the registered cast of it.
    */
  private def sumMeasure(s: Summary, e: Expression): Option[Measure] =
    e match {
      case a: AttributeReference =>
        s.measures.find(m => m.op == "sum" && m.cast.isEmpty &&
          m.baseCol == a.name)
      case Cast(a: AttributeReference, t, _, _) =>
        s.measures.find(m => m.op == "sum" && m.cast.contains(t) &&
          m.baseCol == a.name)
      case _ => None
    }

  private def colMeasure(s: Summary, op: String, e: Expression)
      : Option[Measure] = e match {
    case a: AttributeReference =>
      s.measures.find(m => m.op == op && m.cast.isEmpty && m.baseCol == a.name)
    case _ => None
  }

  private def isCountStar(c: Count): Boolean = c.children match {
    case Seq(Literal(1, _)) => true
    case Seq(Literal(1L, _)) => true
    case _ => false
  }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    val summary = scanOf(agg.child).flatMap(summaryFor).getOrElse {
      return None
    }
    val groupCols = agg.groupingExpressions.map {
      case a: AttributeReference if summary.keys.contains(a.name) => a
      case _ => return None
    }
    // fresh scan of the summary table; its attributes carry new ids —
    // the rewritten output re-aliases to the ORIGINAL ids below
    val sumRel = spark.read.parquet(summary.summaryPath)
      .queryExecution.analyzed
    val sAttr: Map[String, Attribute] =
      sumRel.output.map(a => a.name -> a).toMap
    if (!summary.keys.forall(sAttr.contains) ||
      !summary.measures.forall(m => sAttr.contains(m.summaryCol)))
      return None

    def reAgg(f: AggregateFunction): Option[Expression] = f match {
      case Sum(e, _) => sumMeasure(summary, e).map(m =>
        Cast(
          AggregateExpression(Sum(sAttr(m.summaryCol)), Complete,
            isDistinct = false),
          f.dataType))
      case c: Count if isCountStar(c) =>
        summary.measures.find(_.op == "count").map(m =>
          Coalesce(Seq(
            AggregateExpression(Sum(sAttr(m.summaryCol)), Complete,
              isDistinct = false),
            Literal(0L))))
      case Min(e) => colMeasure(summary, "min", e).map(m =>
        AggregateExpression(Min(sAttr(m.summaryCol)), Complete,
          isDistinct = false))
      case Max(e) => colMeasure(summary, "max", e).map(m =>
        AggregateExpression(Max(sAttr(m.summaryCol)), Complete,
          isDistinct = false))
      case _ => None
    }

    var ok = true
    val newAes: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference if groupCols.exists(_.exprId == a.exprId) =>
        Alias(sAttr(a.name), a.name)(exprId = a.exprId)
      case al: Alias =>
        // transformUp, NOT transformDown: down-recursion would descend
        // into the replacement and re-match its new AggregateExpression
        // (whose summary column is, correctly, not a measure)
        val rewritten = al.child.transformUp {
          case ae: AggregateExpression =>
            if (ae.isDistinct || ae.filter.isDefined) { ok = false; ae }
            else reAgg(ae.aggregateFunction).getOrElse { ok = false; ae }
        }
        // re-bind any remaining direct grouping-column references
        // (e.g. an aliased group key) to the summary's attributes
        val rebound = rewritten.transform {
          case a: AttributeReference
              if groupCols.exists(_.exprId == a.exprId) => sAttr(a.name)
        }
        Alias(rebound, al.name)(exprId = al.exprId)
      case _ => return None
    }
    if (!ok) return None
    // every reference must now resolve against the summary scan — a
    // leftover base attribute means an expression shape we don't cover
    val sumOut = AttributeSet(sumRel.output)
    if (newAes.exists(_.references.exists(r => !sumOut.contains(r))))
      return None
    val newGes: Seq[Expression] = groupCols.map(a => sAttr(a.name))
    Some(Aggregate(newGes, newAes, sumRel))
  }
}
