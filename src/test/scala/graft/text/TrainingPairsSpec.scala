package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class TrainingPairsSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  // docs 1/2 and 3/4 are near-dup pairs; 5..20 are unrelated filler
  private val docs = (Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "alpha beta gamma delta epsilon eta"),
    (3L, "one two three four five six"),
    (4L, "one two three four five seven")) ++
    (5L to 20L).map(i =>
      (i, (0 until 8).map(j => s"w${i}x$j").mkString(" "))))
    .toDF("doc_id", "text")

  private def run(threshold: Double = 0.5) =
    TrainingPairs.contrastive(docs, "doc_id", "text",
      threshold = threshold, negatives = 2, buckets = 4)

  test("triplets: negatives are real docs, never the anchor/positive/partner") {
    val rows = run().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.map(r => (r._1, r._2)).distinct.toSeq.sorted ===
      Seq((1L, 2L), (3L, 4L)))
    rows.foreach { case (a, p, n, _) =>
      assert(n != a && n != p, s"negative $n collides with pair ($a,$p)")
      assert(n >= 1L && n <= 20L, s"negative $n is not a corpus doc")
      // partners of 1 are {2} and of 3 are {4} — already excluded via p
    }
    // every slot filled: 2 pairs × 2 slots
    assert(rows.length === 4)
  }

  test("picks are partitioning-invariant (rendezvous hashing)") {
    val a = run().orderBy("anchor", "slot").collect().map(_.toString).toSeq
    val b = TrainingPairs.contrastive(docs.repartition(13), "doc_id", "text",
        threshold = 0.5, negatives = 2, buckets = 4)
      .orderBy("anchor", "slot").collect().map(_.toString).toSeq
    assert(a === b)
  }

  test("a threshold no pair meets yields an empty, well-typed frame") {
    val out = run(threshold = 0.99)
    assert(out.columns.toSeq ===
      Seq("anchor", "positive", "negative", "slot", "jaccard"))
    assert(out.count() === 0)
  }
}
