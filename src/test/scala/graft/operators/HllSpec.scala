package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** The HLL sketch's two formulations must be bit-identical (registers
  * merge losslessly, the harmonic sum is exact integer arithmetic) and
  * the estimate must land within the sketch's error envelope.
  */
class HllSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.orderBy("grp").collect().toSeq

  test("aggregate form == composable form bit-for-bit, any partitioning") {
    val data = (1 to 5000).map(i => (s"g${i % 3}", s"v${i % 1700}"))
    for (parts <- Seq(1, 4, 13)) {
      val df = data.toDF("g", "v").repartition(parts)
      val a = rows(HllSketch.distinctEstimateAgg(df, "g", "v"))
      val c = rows(HllSketch.distinctEstimate(df, "g", "v"))
      assert(a === c, s"forms diverged at $parts partitions")
    }
  }

  test("estimate lands within the 256-register error envelope") {
    // 50k distinct values per group — far past the register count
    val df = (1 to 100000).map(i => (s"g${i % 2}", s"val$i"))
      .toDF("g", "v").repartition(8)
    HllSketch.distinctEstimateAgg(df, "g", "v").collect().foreach { r =>
      val est = r.getAs[Double]("est_raw")
      val truth = 50000.0
      // 1.04/sqrt(256) ≈ 6.5% std error; 3σ gate
      assert(math.abs(est - truth) / truth < 0.20,
        s"group ${r.getString(0)}: estimate $est vs $truth")
    }
  }

  test("aggregate form plans ONE exchange carrying register states") {
    val df = (1 to 100).map(i => (s"g${i % 3}", s"v$i")).toDF("g", "v")
      .repartition(4)
    val plan = HllSketch.distinctEstimateAgg(df, "g", "v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"typed register buffer must aggregate as ObjectHashAggregate:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"expected exactly one exchange (the 256-byte states):\n$plan")
  }

  test("duplicates do not move the registers") {
    val once = (1 to 2000).map(i => ("g", s"v$i"))
    val dup = once ++ once ++ once
    assert(rows(HllSketch.distinctEstimateAgg(once.toDF("g", "v"), "g", "v"))
      === rows(HllSketch.distinctEstimateAgg(dup.toDF("g", "v").repartition(5),
        "g", "v")))
  }
}
