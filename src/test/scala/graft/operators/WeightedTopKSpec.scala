package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A-ES exact-size weighted sampling: exact k per stratum (all rows
  * when a stratum is smaller), zero-weight rows never selected,
  * selection frequency tracks the weights across independent salts,
  * and the plan keeps the partial top-k (WindowGroupLimit) so only
  * ~k·|strata| rows shuffle.
  */
class WeightedTopKSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("exactly k per stratum; small strata yield all their rows") {
    val df = (0 until 50).map(i => (i.toLong, "big", 1.0 + i)).toDF(
      "id", "s", "w")
      .union(Seq((100L, "small", 5.0), (101L, "small", 1.0))
        .toDF("id", "s", "w"))
    val got = Sampling.weightedTopK(df, "id", "s", "w", 10).collect()
    val bySt = got.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(bySt("big") === 10)
    assert(bySt("small") === 2)
    // ranks are 1..k dense per stratum
    assert(got.filter(_.getString(0) == "big").map(_.getInt(1)).sorted
      .toSeq === (1 to 10))
  }

  test("zero and negative weights never win") {
    val df = Seq((1L, "a", 0.0), (2L, "a", -3.0), (3L, "a", 2.0))
      .toDF("id", "s", "w")
    val got = Sampling.weightedTopK(df, "id", "s", "w", 3).collect()
    assert(got.map(_.getLong(2)).toSeq === Seq(3L))
  }

  test("selection frequency tracks weights across salts") {
    // two rows, weights 9 : 1 — the heavy row should win the k=1 race
    // in ~90% of independent salts
    val df = Seq((1L, "a", 9.0), (2L, "a", 1.0)).toDF("id", "s", "w")
    val wins = (0 until 200).count { i =>
      Sampling.weightedTopK(df, "id", "s", "w", 1, salt = s"t$i")
        .collect()(0).getLong(2) == 1L
    }
    assert(wins > 160 && wins < 200, s"heavy row won $wins/200")
  }

  test("plan keeps the partial top-k before the exchange") {
    val df = (0 until 100).map(i => (i.toLong, s"s${i % 3}", 1.0 + i))
      .toDF("id", "s", "w")
    val plan = Sampling.weightedTopK(df, "id", "s", "w", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no partial top-k:\n$plan")
  }
}
