package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Bigram-LM contract: word-salad with in-vocabulary unigrams scores
  * worse than in-distribution text (the signal the unigram model
  * cannot see), unseen transitions are counted, and short docs score
  * zeros.
  */
class BigramLmSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  // training corpus with STRONG transition structure
  private val train = (0L until 20L).map(i =>
    (i, "the cat sat on the mat and the dog ran to the cat"))
    .toDF("doc_id", "text")

  private lazy val fitted = BigramLm.model(train, "doc_id", "text", k = 50)

  private def score(text: String) =
    BigramLm.scoreWith(Seq((100L, text)).toDF("doc_id", "text"),
        "doc_id", "text", fitted)
      .collect().head

  test("word salad scores higher nll than in-distribution text") {
    val good = score("the cat sat on the mat")
    // same unigrams, scrambled transitions — a unigram model scores
    // these identically
    val salad = score("cat the mat sat the on")
    assert(good.getLong(1) === 5L)
    assert(salad.getLong(4) > good.getLong(4),
      s"salad nll_q ${salad.getLong(4)} must exceed ${good.getLong(4)}")
  }

  test("unseen transitions are counted; smoothing keeps scores finite") {
    val s = score("the zebra jumped") // zebra/jumped are OOV classes too
    assert(s.getLong(1) === 2L)
    assert(s.getLong(2) >= 1L, "expected unseen transitions")
    assert(s.getLong(4) > 0L)
  }

  test("docs with fewer than two tokens score zeros") {
    for (t <- Seq("", "word")) {
      val s = score(t)
      assert(s.getLong(1) === 0L && s.getLong(2) === 0L &&
        s.getDouble(3) === 0.0 && s.getLong(4) === 0L)
    }
  }
}
