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

  test("k-fold: clustered docs share a fold, assignment == md5 replay") {
    val k = 5
    val folds = Sampling.leakageFreeFolds(docs, comps, "doc_id", k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(folds.values.forall(f => f >= 0 && f < k))
    assert(folds(1L) === folds(2L) && folds(2L) === folds(3L))
    assert(folds(10L) === folds(11L))
    // exact replay: (md5-prefix-8 of "fold:<gkey>" * k) >> 32
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
    }
    (1L to 50L).foreach { i =>
      val gkey = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L)
        .getOrElse(i, i)
      assert(folds(i) === (h32(s"fold:$gkey") * k) >> 32, s"doc $i")
    }
    // with 46 independent draws over 5 folds every fold is hit
    assert(folds.values.toSet.size === k)
  }
}
