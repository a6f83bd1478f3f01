package graft.queries

import graft.SparkTestSession
import graft.SparkEntry
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests: the properties that make these queries
  * scale are asserted on the optimized/physical plans, so a future
  * edit that silently breaks pushdown, reintroduces a cartesian
  * product, or adds a stray shuffle fails CI — not a 100 TB run.
  */
class PlanAuditSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("scan-side pushdown: filters reach the parquet scans") {
    val q1 = planOf("q1_agg")
    assert(q1.contains("PushedFilters") && q1.contains("l_shipdate"),
      "q1 ship-date filter must be pushed to the scan")
    val q3 = planOf("q3_join_agg")
    assert(q3.contains("EqualTo(c_mktsegment,BUILDING)"),
      "q3 segment filter must be pushed to the customer scan")
  }

  test("no cartesian products anywhere in the headline queries") {
    SparkEntry.benchQueries.foreach { name =>
      val plan = planOf(name)
      assert(!plan.contains("CartesianProduct"),
        s"$name contains a cartesian product:\n$plan")
    }
  }

  test("per-row text features run without any shuffle") {
    // loadSpread adds ONE round-robin exchange for the single-file test
    // input; beyond that the feature computation itself must add none
    for (name <- Seq("text_stats", "text_langid", "text_tokens",
        "text_fingerprint", "mm_meta")) {
      val plan = planOf(name)
      val exchanges = "Exchange".r.findAllIn(plan).length
      val sorts = plan.contains("TakeOrderedAndProject") ||
        plan.contains("Sort ")
      // one repartition exchange + (possibly) the final presentation sort
      assert(exchanges <= 2,
        s"$name has $exchanges exchanges — per-row features must not shuffle:\n$plan")
      assert(sorts, s"$name lost its deterministic output order")
    }
  }

  test("diff core: one full-outer join, no more than one shuffle per side") {
    val plan = planOf("diff_flags")
    assert("SortMergeJoin".r.findAllIn(plan).length +
      "ShuffledHashJoin".r.findAllIn(plan).length == 1,
      "diff must be a single equi-join:\n" + plan)
    assert(plan.contains("FullOuter"), "diff join must be full outer")
  }

  test("similarity searches keep the corpus un-shuffled before ranking") {
    val plan = planOf("sim_topk")
    // query side broadcasts; corpus side: loadSpread exchange + final
    // top-k window shuffle on q_id — nothing else
    assert(plan.contains("Broadcast"),
      "small query set should broadcast:\n" + plan)
  }

  test("top-k windows run as partial+final WindowGroupLimit (rank pushdown)") {
    // Spark's WindowGroupLimit keeps only k rows per key per PARTITION
    // before the shuffle — the property that makes rank<=k top-k safe at
    // scale (the shuffle moves ~k·|keys| rows, not the full pair fanout)
    for (name <- Seq("sim_topk", "q_window_top_orders")) {
      val plan = planOf(name)
      assert(plan.contains("WindowGroupLimit"),
        s"$name lost the rank-limit pushdown:\n$plan")
      assert(plan.contains("Partial"),
        s"$name WindowGroupLimit is not map-side partial:\n$plan")
    }
  }

  test("IVF assignment aggregates (max_by), never windows the cross product") {
    val plan = graft.similarity.IVFIndex
      .assign(Tables.load(spark, dir, "embeddings"), "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"assignment must not window the vector×centroid stream:\n$plan")
    assert(plan.contains("max_by"), s"expected max_by aggregate:\n$plan")
  }
}
