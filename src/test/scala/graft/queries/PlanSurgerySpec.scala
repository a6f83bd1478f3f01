package graft.queries

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PlanSurgery
import org.scalatest.funsuite.AnyFunSuite

/** Pins what the bench's sort-elision may remove: ONLY a top-level
  * global Sort. Same row SET, same columns, all semantic ordering
  * (top-k limits, window sorts) intact.
  */
class PlanSurgerySpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val df = Seq((3L, "c"), (1L, "a"), (2L, "b")).toDF("id", "v")

  test("removes exactly the top-level presentation sort") {
    val sorted = df.orderBy("id")
    val stripped = PlanSurgery.stripGlobalSort(sorted)
    assert(!stripped.queryExecution.optimizedPlan.toString.contains("Sort"))
    // row set and schema unchanged
    assert(stripped.columns.toSeq === sorted.columns.toSeq)
    assert(stripped.collect().map(_.toString).sorted ===
      sorted.collect().map(_.toString).sorted)
  }

  test("leaves unsorted queries untouched") {
    val plain = df.groupBy("v").count()
    assert(PlanSurgery.stripGlobalSort(plain) eq plain)
  }

  test("top-k orderBy+limit keeps its ordering semantics") {
    val topk = df.orderBy(col("id").desc).limit(2)
    val stripped = PlanSurgery.stripGlobalSort(topk)
    // root is a Limit, not a Sort — surgery must not apply
    assert(stripped.collect().map(_.getLong(0)).toSeq === Seq(3L, 2L))
  }

  test("inner sorts below the top survive") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("v").orderBy("id")
    val q = df.withColumn("rn", row_number().over(w)).orderBy("id")
    val stripped = PlanSurgery.stripGlobalSort(q)
    val plan = stripped.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(stripped.count() === 3L)
  }

  test("every bench slot still materializes its full column set") {
    // the elided form must differ from the gate form ONLY in ordering:
    // spot-check a corpus-scale slot end to end at sf0.001
    val gate = graft.SparkEntry.queries("text_tokens")(spark,
      "/root/testdata/sf0.001")
    val bench = PlanSurgery.stripGlobalSort(
      graft.SparkEntry.queries("text_tokens")(spark, "/root/testdata/sf0.001"))
    assert(bench.columns.toSeq === gate.columns.toSeq)
    assert(bench.collect().map(_.toString).sorted ===
      gate.collect().map(_.toString).sorted)
  }
}
