package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality rule engine — the "expectations" report a
  * warehouse runs against every ingested table (null contracts, value
  * ranges, format regexes, key uniqueness, referential integrity),
  * long-form: one row per rule with exact violation counts.
  *
  * Scale shape: ALL single-table rules for a table fold into ONE
  * aggregate over ONE scan — each rule is a `sum(when(violation, 1))`
  * column (map-side combined, a 1-row exchange), and the long-form
  * melt explodes the single result row, so adding a rule never adds a
  * pass. A `Unique` rule adds a `count(distinct)` to the same
  * aggregate (Spark plans one distinct per table without `Expand`;
  * several Unique rules on one table would Expand — split tables in
  * that case). Referential integrity is the one rule class that needs
  * a join: a left join against the parent's distinct keys, with total
  * and violation counts taken in the SAME aggregate, so the child is
  * still scanned exactly once (the parent side is dimension-sized and
  * broadcasts).
  *
  * Semantics (pinned by the `dq_checks` oracle):
  *   - `InRange` / `Matches` count only NON-NULL out-of-contract
  *     values — pair them with `NotNull` to forbid nulls, as SQL CHECK
  *     constraints do;
  *   - `Unique` counts surplus rows (`count(*) - count(distinct key)`)
  *     and REQUIRES non-null key columns (pair with `NotNull`):
  *     `count(distinct)` skips nulls, so null keys land in the surplus
  *     here, while engines with row-valued distinct (DuckDB's
  *     `DISTINCT (a, b)`) would count them — only the non-null-key
  *     contract is engine-portable;
  *   - `ForeignKey` follows SQL FK semantics: a null child key is not
  *     a violation.
  */
object Quality {

  sealed trait Rule { def id: String; def describe: String }

  final case class NotNull(id: String, column: String) extends Rule {
    def describe = s"$column is not null"
  }

  /** Bounds are SQL literal expressions (e.g. "0", "400000", "DATE
    * '1995-01-01'") so one string serves both the Spark `expr` and a
    * SQL oracle verbatim.
    */
  final case class InRange(id: String, column: String, lo: String, hi: String)
    extends Rule {
    def describe = s"$column between $lo and $hi"
  }

  final case class Matches(id: String, column: String, regex: String)
    extends Rule {
    def describe = s"$column matches $regex"
  }

  final case class Unique(id: String, columns: Seq[String]) extends Rule {
    def describe = s"(${columns.mkString(", ")}) unique"
  }

  /** One row per rule: (rule_id, table_name, rule, violations, total,
    * pass) — single scan, single 1-row exchange.
    */
  def check(df: DataFrame, table: String, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules given")
    require(rules.map(_.id).distinct.size == rules.size,
      s"duplicate rule ids: ${rules.map(_.id).diff(rules.map(_.id).distinct)}" +
        " — the per-rule aggregate columns are keyed by id")
    require(rules.count(_.isInstanceOf[Unique]) <= 1,
      "several Unique rules on one table would plan an Expand — " +
        "run them as separate check() calls")
    val vexprs = rules.map { r =>
      (r match {
        // sums coalesce to 0: an EMPTY table has no violations, not
        // null ones
        case NotNull(_, c) =>
          coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
        case InRange(_, c, lo, hi) =>
          coalesce(sum(when(col(c).isNotNull &&
            !col(c).between(expr(lo), expr(hi)), 1L).otherwise(0L)), lit(0L))
        case Matches(_, c, re) =>
          coalesce(sum(when(col(c).isNotNull && !col(c).rlike(re), 1L)
            .otherwise(0L)), lit(0L))
        case Unique(_, cols) =>
          count(lit(1)) - count_distinct(col(cols.head), cols.tail.map(col): _*)
      }).as(s"__v_${r.id}")
    }
    val agg = df.agg(count(lit(1)).as("__total"), vexprs: _*)
    melt(agg, table, rules.map(r => (r.id, r.describe, s"__v_${r.id}")))
  }

  /** Referential-integrity rule: child rows whose non-null `childCol`
    * has no match in `parent.parentCol`. One child scan — the total
    * rides the same aggregate as the violation count.
    */
  def foreignKey(child: DataFrame, childTable: String, childCol: String,
      parent: DataFrame, parentTable: String, parentCol: String,
      id: String): DataFrame = {
    val keys = parent.select(col(parentCol).as("__fk")).distinct()
      .withColumn("__hit", lit(1L))
    val agg = child.select(col(childCol).as("__fk"))
      .join(keys, Seq("__fk"), "left")
      .agg(count(lit(1)).as("__total"),
        coalesce(sum(when(col("__fk").isNotNull && col("__hit").isNull, 1L)
          .otherwise(0L)), lit(0L)).as(s"__v_$id"))
    melt(agg, childTable,
      Seq((id, s"$childCol references $parentTable.$parentCol", s"__v_$id")))
  }

  /** Union per-table reports into one ordered run summary. */
  def report(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_.unionByName(_)).orderBy("table_name", "rule_id")

  private def melt(agg: DataFrame, table: String,
      rows: Seq[(String, String, String)]): DataFrame =
    agg.select(explode(array(rows.map { case (id, desc, vcol) =>
        struct(lit(id).as("rule_id"), lit(table).as("table_name"),
          lit(desc).as("rule"), col(vcol).as("violations"),
          col("__total").as("total"))
      }: _*)).as("r"))
      .select(col("r.*"))
      .withColumn("pass", col("violations") === 0L)
}
