package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Uncertainty sampling: rows closest to the decision boundary win in
  * |score| order with id tie-breaks, and the selection plans as a
  * partial top-k (TakeOrderedAndProject), never a global sort.
  */
class UncertaintySampleSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("smallest |score| wins; ties break by id; rank is dense") {
    val df = Seq(
      (1L, 100L), (2L, -3L), (3L, 3L), (4L, 0L), (5L, -50L), (6L, 7L)
    ).toDF("doc_id", "logodds_q")
    val got = UncertaintySample.topUncertain(df, "doc_id", "logodds_q", 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // |0| < |−3| = |3| (2 before 3 by id) < |7|
    assert(got.toSeq === Seq((1, 4L, 0L), (2, 2L, -3L), (3, 3L, 3L),
      (4, 6L, 7L)))
  }

  test("selection plans as TakeOrderedAndProject (no global sort)") {
    val df = (0 until 1000).map(i => (i.toLong, (i % 37 - 18).toLong))
      .toDF("doc_id", "logodds_q").repartition(8)
    val plan = UncertaintySample.topUncertain(df, "doc_id", "logodds_q", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }
}
