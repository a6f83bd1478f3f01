package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class DriftSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("rate deltas: lost tokens negative, enriched tokens positive") {
    // A: 10 tokens total — aa×4 bb×4 cc×2; B drops the cc doc and one
    // bb doc: 6 total — aa×4 bb×2
    val a = Seq((1L, "aa aa bb bb"), (2L, "aa aa bb bb"), (3L, "cc cc"))
      .toDF("doc_id", "text")
    val b = Seq((1L, "aa aa bb bb"), (2L, "aa aa")).toDF("doc_id", "text")
    val out = Drift.tokenDrift(a, b, "text", k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byTok = out.map(r => r._1 -> r).toMap
    assert(byTok("cc") === (("cc", 2L, 0L, 0.0 / 6 - 2.0 / 10))) // vanished
    assert(byTok("aa")._4 === 4.0 / 6 - 4.0 / 10) // enriched by shrinkage
    assert(byTok("bb")._4 === 2.0 / 6 - 4.0 / 10)
    // ordering: |delta| desc — aa (+0.2667) before cc (-0.2) before bb
    assert(out.map(_._1).toSeq === Seq("aa", "cc", "bb"))
  }

  test("identical snapshots drift nowhere; k cuts the table") {
    val a = Seq((1L, "xx yy zz"), (2L, "xx yy")).toDF("doc_id", "text")
    val all = Drift.tokenDrift(a, a, "text", k = 10).collect()
    assert(all.forall(_.getDouble(3) === 0.0))
    assert(all.length === 3)
    assert(Drift.tokenDrift(a, a, "text", k = 2).collect().length === 2)
  }

  test("top-k movers plan as TakeOrderedAndProject, not a full sort") {
    val a = Seq((1L, "xx yy")).toDF("doc_id", "text")
    val plan = Drift.tokenDrift(a, a, "text", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
