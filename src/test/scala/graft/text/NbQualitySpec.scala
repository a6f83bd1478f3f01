package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class NbQualitySpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  // negRate = 1.0: every non-positive doc joins the negative seed, so
  // the closed-form arithmetic below has no md5 draw in it
  private val cfg = NbQuality.Config(
    posSources = Seq("src0"), negRate = 1.0, negSalt = "t", vocabK = 4)

  /** The expression's fold: acc -= StrictMath.log(smoothed/denom) in
    * token order — the spec recomputes nll the same way.
    */
  private def nll(counts: Map[String, Long], denom: Double,
      toks: Seq[String]): Double = {
    var acc = 0.0
    toks.foreach { t =>
      val c = (counts.getOrElse(t, 0L) + 1L).toDouble
      acc -= StrictMath.log(c / denom)
    }
    acc
  }

  test("fit computes exact per-class counts, denominators, and priors") {
    val docs = Seq(
      (1L, "aa aa bb", "src0"),
      (2L, "cc cc bb", "srcX"),
      (3L, "aa bb zz", "srcY")).toDF("doc_id", "text", "source")
    val m = NbQuality.fit(docs, "doc_id", "text", cfg)
    assert(m.posCounts === Map("aa" -> 2L, "bb" -> 1L, "cc" -> 0L, "zz" -> 0L))
    assert(m.negCounts === Map("aa" -> 1L, "bb" -> 2L, "cc" -> 2L, "zz" -> 1L))
    assert(m.posDenom === 8.0) // 3 pos tokens + k + 1
    assert(m.negDenom === 11.0) // 6 neg tokens + k + 1
    assert(m.nPosDocs === 1L && m.nNegDocs === 2L)
  }

  test("log-odds match the closed-form two-model difference") {
    val docs = Seq(
      (1L, "aa aa bb", "src0"),
      (2L, "cc cc bb", "srcX"),
      (3L, "aa bb zz", "srcY")).toDF("doc_id", "text", "source")
    val m = NbQuality.fit(docs, "doc_id", "text", cfg)
    val out = NbQuality.scoreWith(docs, "doc_id", "text", m)
      .orderBy("doc_id").collect()
    val prior = StrictMath.log(1.0) - StrictMath.log(2.0)
    Seq("aa aa bb", "cc cc bb", "aa bb zz").zipWithIndex.foreach {
      case (text, i) =>
        val toks = text.split(" ").toSeq
        val lo = prior +
          (nll(m.negCounts, m.negDenom, toks) -
            nll(m.posCounts, m.posDenom, toks))
        assert(out(i).getLong(3) === math.floor(lo * 1e6).toLong,
          s"doc ${i + 1}")
        assert(out(i).getInt(4) === (if (math.floor(lo * 1e6) > 0) 1 else 0))
    }
    // doc1 is the positive seed itself: must classify positive; doc2 is
    // pure negative vocabulary: must classify negative
    assert(out(0).getInt(4) === 1)
    assert(out(1).getInt(4) === 0)
  }

  test("separates reference-like from gibberish documents") {
    val ref = (1L to 20L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog", "src0"))
    val junk = (21L to 40L).map(i =>
      (i, s"zxq$i qqzz xkcd$i vvv qz zz xq vq zq xz", "srcJ"))
    val docs = (ref ++ junk).toDF("doc_id", "text", "source")
    // vocab must cover the corpus: with a truncated vocabulary an
    // all-OOV doc scores on the OOV mass alone, which only reflects the
    // class-size ratio (the classic smoothing artifact), not content
    val out = NbQuality.score(docs, "doc_id", "text", cfg.copy(vocabK = 300))
      .orderBy("doc_id").collect()
    (0 until 20).foreach(i => assert(out(i).getInt(4) === 1, s"ref doc $i"))
    (20 until 40).foreach(i => assert(out(i).getInt(4) === 0, s"junk doc $i"))
  }

  test("empty and null docs carry the prior alone") {
    val docs = Seq(
      (1L, "aa bb", "src0"),
      (2L, "aa cc", "srcX"),
      (3L, "", "srcX"),
      (4L, null.asInstanceOf[String], "srcX")).toDF("doc_id", "text", "source")
    val m = NbQuality.fit(docs, "doc_id", "text", cfg)
    val out = NbQuality.scoreWith(docs, "doc_id", "text", m)
      .orderBy("doc_id").collect()
    val prior = StrictMath.log(1.0) - StrictMath.log(3.0)
    Seq(2, 3).foreach { i =>
      assert(out(i).getLong(1) === 0L)
      assert(out(i).getLong(3) === math.floor(prior * 1e6).toLong)
    }
  }

  test("fixed-vocab batch models merge exactly into the union fit") {
    val vocab = Seq("aa", "bb", "cc", "zz")
    val b1 = Seq(
      (1L, "aa aa bb", "src0"), (2L, "cc cc bb", "srcX")).toDF(
      "doc_id", "text", "source")
    val b2 = Seq(
      (3L, "aa bb zz qq", "src0"), (4L, "zz cc", "srcY")).toDF(
      "doc_id", "text", "source")
    val merged = NbQuality.merge(
      NbQuality.fitWithVocab(b1, "doc_id", "text", cfg, vocab),
      NbQuality.fitWithVocab(b2, "doc_id", "text", cfg, vocab))
    val union = NbQuality.fitWithVocab(b1.union(b2), "doc_id", "text",
      cfg, vocab)
    assert(merged === union) // exact: counts, denoms, priors
    // bit-equal scores through the merged model ("qq" stays OOV — the
    // fixed vocab is what makes the fold identical on both paths)
    val docs = b1.union(b2)
    val viaMerged = NbQuality.scoreWith(docs, "doc_id", "text", merged)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val viaUnion = NbQuality.scoreWith(docs, "doc_id", "text", union)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(viaMerged === viaUnion)
  }

  test("merge uses the stored smoothing K, not map size (small-vocab fit)") {
    // seed vocabulary (3 distinct tokens) far smaller than vocabK=200,
    // so posCounts.size != K — the r9 advice hole: inferring K from
    // map size would corrupt the recovered token totals
    val docs = Seq(
      (1L, "aa aa bb", "src0"), (2L, "cc bb", "srcX")).toDF(
      "doc_id", "text", "source")
    val m = NbQuality.fit(docs, "doc_id", "text", cfg.copy(negRate = 1.0))
    assert(m.posCounts.size < m.vocabK)
    val merged = NbQuality.merge(m, m)
    // totals double exactly: denom = 2*total + K + 1
    assert(merged.posDenom === (2L * 3L + cfg.vocabK + 1L).toDouble)
    assert(merged.negDenom === (2L * 2L + cfg.vocabK + 1L).toDouble)
    assert(merged.nPosDocs === 2L && merged.nNegDocs === 2L)
    // and models smoothed over different K refuse to merge
    intercept[IllegalArgumentException] {
      NbQuality.merge(m, m.copy(vocabK = m.vocabK + 1))
    }
  }

  test("fixed-vocab fit counts only vocabulary tokens, totals count all") {
    val docs = Seq((1L, "aa qq qq", "src0"), (2L, "bb", "srcX"))
      .toDF("doc_id", "text", "source")
    val m = NbQuality.fitWithVocab(docs, "doc_id", "text", cfg,
      Seq("aa", "bb"))
    assert(m.posCounts === Map("aa" -> 1L, "bb" -> 0L))
    assert(m.negCounts === Map("aa" -> 0L, "bb" -> 1L))
    assert(m.posDenom === 6.0) // 3 pos tokens (qq included) + k=2 + 1
    assert(m.negDenom === 4.0)
  }

  test("scoring is a pure projection — no exchange on the score path") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val m = NbQuality.fit(docs, "doc_id", "text",
      cfg.copy(posSources = Seq("src0", "src1"), negRate = 0.25))
    val plan = NbQuality.scoreWith(docs, "doc_id", "text", m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("unigram_score"), plan)
  }
}
