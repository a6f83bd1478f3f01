package graft.text

import graft.SparkTestSession
import graft.operators.KmvSketch
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based invariants of the round-5 prep operators against
  * naive driver-side replicas, over random corpora.
  */
object PrepOpsProps extends Properties("PrepOps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  private lazy val spark = SparkTestSession.spark

  private val genWord: Gen[String] = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")

  private val genDoc: Gen[String] =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, genWord)).map(_.mkString(" "))

  private val genCorpus: Gen[Seq[(Long, String)]] =
    Gen.choose(1, 15).flatMap(n => Gen.listOfN(n, genDoc))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  private def grams(text: String, n: Int): Set[String] = {
    val w = text.toLowerCase.split(" ", -1).toSeq
    if (w.length < n) Set.empty
    else w.sliding(n).map(_.mkString(" ")).toSet
  }

  // ---- decontam vs a driver-side set-intersection ------------------------

  property("decontam == naive distinct-gram intersection counts") =
    forAll(genCorpus, genCorpus) { (train, eval) =>
      import spark.implicits._
      val got = Decontam.overlap(train.toDF("doc_id", "text"),
          eval.toDF("doc_id", "text"), "doc_id", "text",
          n = 2, minSharedGrams = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val evalGrams = eval.flatMap(d => grams(d._2, 2)).toSet
      val want = train
        .map { case (id, t) => (id, (grams(t, 2) & evalGrams).size.toLong) }
        .filter(_._2 > 0)
        .map { case (id, k) => (id, k, if (k >= 2) 1 else 0) }
        .toSet
      got == want
    }

  // ---- chunker: coverage + count invariants ------------------------------

  private val genChunkCfg: Gen[(Int, Int)] =
    for { c <- Gen.choose(1, 8); s <- Gen.choose(1, c) } yield (c, s)

  property("chunker covers every token; count and sizes match the formula") =
    forAll(genCorpus, genChunkCfg) { case (docs, (chunkSize, stride)) =>
      import spark.implicits._
      val out = Chunker.chunks(docs.toDF("doc_id", "text"), "doc_id", "text",
          chunkSize, stride)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1)
      docs.forall { case (id, text) =>
        val n = text.toLowerCase.split(" ", -1).length // never 0
        val wantChunks = if (n <= chunkSize) 1L
          else 1L + math.ceil((n - chunkSize).toDouble / stride).toLong
        val chunks = out(id).sortBy(_._2)
        val covered = chunks.map { case (_, idx, len) =>
          (idx * stride) until (idx * stride + len) }
        chunks.length == wantChunks &&
          chunks.map(_._2).toSeq == (0L until wantChunks) &&
          // contiguous coverage of exactly [0, n)
          covered.flatten.toSet == (0 until n).toSet &&
          // every chunk is full-size except possibly the last
          chunks.init.forall(_._3 == chunkSize) &&
          chunks.last._3 == n - (wantChunks - 1) * stride
      }
    }

  // ---- kmv: exact-below-k + duplication invariance -----------------------

  private val genValues: Gen[Seq[String]] =
    Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 30).map(i => s"v$i")))

  property("kmv below k is exact; duplication never changes the sketch") =
    forAll(genValues) { vs =>
      import spark.implicits._
      val once = vs.map(("g", _)).toDF("grp", "v")
      val dup = (vs ++ vs).map(("g", _)).toDF("grp", "v")
      val k = 64 // distinct(vs) <= 31 < k → exact path
      val a = KmvSketch.distinctEstimate(once, "grp", "v", k).head()
      val b = KmvSketch.distinctEstimate(dup, "grp", "v", k).head()
      val truth = vs.distinct.size
      a.getLong(1) == truth && a.getDouble(3) == truth.toDouble &&
        b.getLong(1) == a.getLong(1) && b.getDouble(3) == a.getDouble(3)
    }
}
