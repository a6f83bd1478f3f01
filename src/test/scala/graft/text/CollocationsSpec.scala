package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class CollocationsSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("pmi ratio matches the hand computation; ranking prefers exclusive pairs") {
    // "a b" occurs 3×, "c d" occurs 3×, but c and d appear ONLY
    // together while a and b also occur alone → PMI(c,d) > PMI(a,b)
    val docs = Seq(
      (1L, "a b x a b"),
      (2L, "a b a x"),
      (3L, "c d y c d"),
      (4L, "c d b y")).toDF("doc_id", "text")
    val out = Collocations.topPmi(docs, "text", k = 10, minPairCount = 3L)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap

    // corpus: doc words 5+4+5+4 = 18 tokens, pairs 4+3+4+3 = 14
    val (n, m) = (18L, 14L)
    val (cab, ca, cb, score) = out(("a", "b"))
    assert((cab, ca, cb) === ((3L, 4L, 4L)))
    assert(score === (3.0 * n * n) / (m.toDouble * ca * cb))
    // c and d occur 3× each, only ever together → 3·18²/(14·9) beats
    // a-b's 3·18²/(14·16)
    assert(out(("c", "d"))._1 === 3L)
    assert(out(("c", "d"))._4 > score)
  }

  test("min pair count prunes rare pairs; k caps the output") {
    val docs = Seq((1L, "p q p q r s")).toDF("doc_id", "text")
    val all = Collocations.topPmi(docs, "text", k = 10, minPairCount = 2L)
      .collect()
    assert(all.map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("p", "q")))
    val capped = Collocations.topPmi(docs, "text", k = 0, minPairCount = 1L)
    assert(capped.count() === 0)
  }

  test("one-word and empty docs contribute tokens but no pairs") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "a b a b a b"))
      .toDF("doc_id", "text")
    val out = Collocations.topPmi(docs, "text", k = 5, minPairCount = 1L)
      .collect()
    // pairs only from doc 3; totals count doc 1's and 2's tokens
    // (split("") = [""] — one empty token, same as the oracle dialect)
    val ab = out.find(r => r.getString(0) == "a" && r.getString(1) == "b").get
    assert(ab.getLong(2) === 3L) // c_ab
    assert(ab.getLong(3) === 3L) // c_a
  }
}
