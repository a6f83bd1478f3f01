package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class BradleyTerrySpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("games summarizes outcomes into ordered pairs") {
    val outcomes = Seq((2L, 1L), (1L, 2L), (2L, 1L), (3L, 1L))
      .toDF("winner", "loser")
    val g = BradleyTerry.games(outcomes, "winner", "loser")
      .orderBy("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(g.toSeq === Seq((1L, 2L, 3L, 1L), (1L, 3L, 1L, 0L)))
  }

  test("two entities recover the closed-form win-rate strengths") {
    // A beats B 3 of 4: the BT fixed point is sA/(sA+sB) = 3/4
    val outcomes = (Seq.fill(3)((1L, 2L)) ++ Seq((2L, 1L)))
      .toDF("winner", "loser")
    val s = BradleyTerry.strengths(spark,
        BradleyTerry.games(outcomes, "winner", "loser"), iters = 30)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(math.abs(s(0)._2 - 0.75) < 1e-9)
    assert(math.abs(s(1)._2 - 0.25) < 1e-9)
  }

  test("transitive dominance orders the leaderboard") {
    val outcomes = (
      Seq.fill(8)((1L, 2L)) ++ Seq.fill(2)((2L, 1L)) ++
      Seq.fill(8)((2L, 3L)) ++ Seq.fill(2)((3L, 2L)) ++
      Seq.fill(8)((1L, 3L)) ++ Seq.fill(2)((3L, 1L))).toDF("w", "l")
    val s = BradleyTerry.strengths(spark,
        BradleyTerry.games(outcomes, "w", "l"))
      .orderBy("id").collect().map(_.getDouble(3))
    assert(s(0) > s(1) && s(1) > s(2))
    assert(math.abs(s.sum - 1.0) < 1e-12) // normalized
  }

  test("strengths are partitioning-invariant (ordered folds)") {
    val outcomes = (1L to 200L).map(i => (i % 7, (i % 7 + 1 + i % 3) % 9))
      .filter(p => p._1 != p._2).toDF("w", "l")
    def run(df: org.apache.spark.sql.DataFrame) =
      BradleyTerry.strengths(spark, BradleyTerry.games(df, "w", "l"))
        .orderBy("id").collect().map(_.toString).toSeq
    assert(run(outcomes) === run(outcomes.repartition(13)))
  }

  test("an entity with zero wins lands at strength zero, others renormalize") {
    val outcomes = Seq((1L, 2L), (1L, 2L), (3L, 2L)).toDF("w", "l")
    val s = BradleyTerry.strengths(spark,
        BradleyTerry.games(outcomes, "w", "l"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(s.find(_._1 == 2L).get._2 === 0.0)
    assert(math.abs(s.map(_._2).sum - 1.0) < 1e-12)
  }
}
