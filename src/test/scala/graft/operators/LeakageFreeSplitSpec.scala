package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Leakage-free split contract: every component's members share one
  * side, singletons fall back to the per-id draw (identical to
  * splitColumn), and the extreme fractions behave.
  */
class LeakageFreeSplitSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = (1L to 50L).map(i => Tuple1(i)).toDF("doc_id")
  // components: {1,2,3} and {10,11}; everything else singleton
  private val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L),
    (11L, 10L)).toDF("id", "comp")

  private def splits(evalFraction: Double): Map[Long, String] =
    Sampling.leakageFreeSplit(docs, comps, "doc_id", evalFraction)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("cluster members always share a side") {
    for (f <- Seq(0.1, 0.3, 0.5, 0.9)) {
      val s = splits(f)
      assert(Set(s(1L), s(2L), s(3L)).size === 1, s"cluster 1 split at f=$f")
      assert(s(10L) === s(11L), s"cluster 10 split at f=$f")
    }
  }

  test("singletons draw exactly splitColumn on their own id") {
    val s = splits(0.3)
    val direct = docs
      .select($"doc_id", Sampling.splitColumn($"doc_id", 0.3).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (1L to 50L).filterNot(Set(1L, 2L, 3L, 10L, 11L)).foreach { i =>
      assert(s(i) === direct(i), s"singleton $i diverged from splitColumn")
    }
  }

  test("fraction 0 puts everything in train") {
    assert(splits(0.0).values.toSet === Set("train"))
  }
}
