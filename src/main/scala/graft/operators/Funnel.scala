package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential funnel analysis: how many entities complete step 1, then
  * step 2 strictly after their first step-1 completion, then step 3
  * strictly after that, … — the product-analytics staple (and, in a
  * training-data pipeline, the acceptance funnel of a multi-stage
  * screen: fetched → passed-quality → deduped → packed).
  *
  * Semantics: an entity is at stage i when it has an event of type
  * `steps(i)` with timestamp STRICTLY after its stage-(i-1) first
  * completion time; its stage-i completion time is the MIN such
  * timestamp. Ties at exactly the previous stage's instant do not
  * advance the funnel (same `>` on both engines).
  *
  * Shape for scale — ONE shuffle of the events table: every stage's
  * first-completion time is a chained windowed min over the SAME
  * `partitionBy(entity)` (no orderBy, so no sort), and the per-entity
  * rollup groups by that same key, so Catalyst plans a single
  * hash-partitioning exchange reused by all window nodes and the
  * aggregate. The final stage table is a one-row global aggregate
  * unpivoted with `stack` — bytes, not data.
  */
object Funnel {

  /** Stage table: (step, stage, n_entities, conv) — `conv` is the
    * fraction of the previous stage's entities (stage 1 converts from
    * the full distinct-entity universe), 0.0 when the previous stage
    * is empty.
    */
  def stages(events: DataFrame, entityCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col(entityCol))
    val withTimes = steps.zipWithIndex.foldLeft(events) {
      case (df, (step, i)) =>
        val cond =
          if (i == 0) col(typeCol) === step
          else col(typeCol) === step && col(tsCol) > col(s"__t${i - 1}")
        df.withColumn(s"__t$i", min(when(cond, col(tsCol))).over(w))
    }
    val perEntity = withTimes.groupBy(col(entityCol))
      .agg(first(col("__t0")).as("__t0"),
        steps.indices.drop(1).map(i => first(col(s"__t$i")).as(s"__t$i")): _*)
    val counts = perEntity.agg(
      count(lit(1)).as("n_total"),
      steps.indices.map(i =>
        sum(when(col(s"__t$i").isNotNull, 1L).otherwise(0L)).as(s"__n$i")): _*)
    // unpivot the one-row count vector into (step, stage, n, n_prev);
    // step names embed in a SQL string literal — escape backslashes
    // (the parser unescapes sequences) then double any quotes
    val stackArgs = steps.zipWithIndex.map { case (step, i) =>
      val prev = if (i == 0) "n_total" else s"__n${i - 1}"
      val lit = step.replace("\\", "\\\\").replace("'", "''")
      s"${i + 1}, '$lit', __n$i, $prev"
    }.mkString(", ")
    counts
      .selectExpr(s"stack(${steps.size}, $stackArgs) AS " +
        "(step, stage, n_entities, n_prev)")
      .select(col("step").cast("int").as("step"), col("stage"),
        // sum over ZERO entities is null — surface empty input as 0s
        coalesce(col("n_entities"), lit(0L)).cast("bigint").as("n_entities"),
        when(col("n_prev") > 0,
            col("n_entities").cast("double") / col("n_prev").cast("double"))
          .otherwise(0.0).as("conv"))
  }
}
