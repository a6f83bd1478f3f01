package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class DistinctiveSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val common = "alpha beta gamma delta epsilon"

  test("a group-concentrated token tops its group; spread tokens don't") {
    // "zebra" saturates group A; filler vocabulary is uniform
    val docs = (
      (1L to 30L).map(i => (i, "a", s"$common zebra zebra zebra")) ++
      (31L to 60L).map(i => (i, "b", s"$common"))
    ).toDF("doc_id", "source", "text")
    val out = Distinctive
      .distinctiveTerms(docs, "source", "text", vocabK = 20, topPerGroup = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(5)))
    val aTop = out.filter(_._1 == "a")
    assert(aTop.head._2 === "zebra", aTop.toSeq)
    assert(aTop.head._3 > 0L, "over-represented token must have z > 0")
    // zebra is ABSENT from b's counts entirely (per-group counts only
    // cover observed tokens), so b's list is filler with z near zero
    assert(!out.filter(_._1 == "b").exists(_._2 == "zebra"))
    spark.catalog.clearCache()
  }

  test("the prior shrinks a rare token below a well-attested one") {
    // both exclusive to group a: "whale" once, "raven" 20 times —
    // same raw rate ratio direction, but the evidence differs
    val docs = (
      (1L to 20L).map(i => (i, "a", s"$common raven")) ++
      Seq((21L, "a", s"$common whale")) ++
      (31L to 60L).map(i => (i, "b", common))
    ).toDF("doc_id", "source", "text")
    val out = Distinctive
      .distinctiveTerms(docs, "source", "text", vocabK = 20, topPerGroup = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(5)).toMap
    assert(out(("a", "raven")) > out(("a", "whale")),
      s"20 observations must outrank 1: $out")
    spark.catalog.clearCache()
  }
}
