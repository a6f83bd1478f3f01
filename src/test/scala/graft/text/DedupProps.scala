package graft.text

import graft.SparkTestSession
import graft.dedup.IncrementalDedup
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property invariants of the round-8 dedup operators vs naive
  * driver-side reference implementations over random corpora from a
  * tiny token alphabet (maximal accidental sharing — the adversarial
  * regime for postings-based span detection).
  */
object DedupProps extends Properties("Round8Dedup") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  private lazy val spark = SparkTestSession.spark

  private val genDocs: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(2, 8)
    docs <- Gen.listOfN(n, for {
      len <- Gen.choose(0, 12)
      toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d"))
    } yield toks.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  /** Naive span reference: mark every position whose k-gram occurs in
    * some OTHER doc, then merge consecutive positions.
    */
  private def naiveSpans(docs: Seq[(Long, String)], k: Int)
      : Set[(Long, Long, Long, Long)] = {
    // split(" ", -1) mirrors TextFeatures.words exactly: an empty doc is
    // ONE empty token (Spark split and DuckDB string_split agree), so two
    // empty docs legitimately share the "" k=1 gram
    val grams = docs.map { case (id, t) =>
      id -> t.split(" ", -1).sliding(k)
        .filter(_.length == k).map(_.mkString(" ")).toVector
    }.toMap
    val df = grams.toSeq.flatMap { case (id, gs) => gs.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    grams.toSeq.flatMap { case (id, gs) =>
      val marked = gs.zipWithIndex.collect {
        case (g, i) if df(g) >= 2 => i + 1 // 1-based
      }
      // islands over consecutive marked positions
      marked.foldLeft(Vector.empty[Vector[Int]]) {
        case (acc, p) if acc.nonEmpty && acc.last.last == p - 1 =>
          acc.init :+ (acc.last :+ p)
        case (acc, p) => acc :+ Vector(p)
      }.map(run => (id, run.head.toLong, (run.last + k - 1).toLong,
        (run.last - run.head + k).toLong))
    }.toSet
  }

  property("DupSpans == naive positional k-gram islands") =
    forAll(genDocs, Gen.choose(1, 3)) { (docs, k) =>
      import spark.implicits._
      val got = DupSpans.spans(docs.toDF("doc_id", "text"), "doc_id", "text", k)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      got == naiveSpans(docs, k)
    }

  property("excise == rebuild from naive span coverage") =
    forAll(genDocs, Gen.choose(1, 3)) { (docs, k) =>
      import spark.implicits._
      val got = DupSpans
        .excise(docs.toDF("doc_id", "text"), "doc_id", "text", k)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
      val covered = naiveSpans(docs, k)
        .groupBy(_._1)
        .view.mapValues(_.flatMap { case (_, s, e, _) => s to e }.toSet)
        .toMap
      val want = docs.map { case (id, t) =>
        val toks = t.split(" ", -1)
        val cov = covered.getOrElse(id, Set.empty[Long])
        val kept = toks.zipWithIndex.collect {
          case (tok, i) if !cov.contains(i + 1L) => tok
        }
        (id, kept.mkString(" "), (toks.length - kept.length).toLong)
      }.toSet
      got == want
    }

  private val genCorpusBatch: Gen[(Seq[(Long, String)], Seq[(Long, String)])] =
    for {
      corpus <- genDocs
      nb <- Gen.choose(1, 4)
      batch <- Gen.listOfN(nb, Gen.frequency(
        3 -> Gen.oneOf(corpus.map(_._2)), // exact clone of a corpus doc
        2 -> (for {
          len <- Gen.choose(0, 12)
          toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d"))
        } yield toks.mkString(" "))))
    } yield (corpus, batch.zipWithIndex.map { case (t, i) => (100L + i, t) })

  property("IncrementalDedup: exact_dup iff text match; near_dup is sound") =
    forAll(genCorpusBatch) { case (corpus, batch) =>
      import spark.implicits._
      val got = IncrementalDedup.verdicts(
          corpus.toDF("doc_id", "text"), batch.toDF("doc_id", "text"),
          "doc_id", "text")
        .collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3))))
        .toMap
      val corpusTexts = corpus.map(_._2).toSet
      def shingles(t: String): Set[String] =
        t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      def jac(a: Set[String], b: Set[String]): Double =
        if (a.isEmpty && b.isEmpty) 0.0
        else a.intersect(b).size.toDouble / a.union(b).size
      batch.forall { case (id, t) =>
        val (e, n, keep) = got(id)
        val exactWant = if (corpusTexts.contains(t)) 1 else 0
        // near_dup SOUNDNESS: every near flag is backed by a true
        // Jaccard >= 0.8 partner (completeness is up to LSH recall, so
        // it is not asserted here; the planted-corpus spec covers it)
        val nearSound = n == 0 ||
          corpus.exists { case (_, ct) => jac(shingles(t), shingles(ct)) >= 0.8 }
        e == exactWant && nearSound && keep == (if (e == 0 && n == 0) 1 else 0)
      }
    }

  private val genEdges: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.choose(1, 12)
    edges <- Gen.listOfN(n, for {
      a <- Gen.choose(0L, 9L)
      b <- Gen.choose(0L, 9L) if a != b
    } yield (a, b))
  } yield edges

  property("appendComponents(cc(a), b) == cc(a ++ b) on random graphs") =
    forAll(genEdges, genEdges) { (ea, eb) =>
      import spark.implicits._
      val a = ea.toDF("x", "y")
      val b = eb.toDF("x", "y")
      val standing = graft.dedup.Clusters.connectedComponents(a, "x", "y")
      val got = graft.dedup.Clusters.appendComponents(standing, b, "x", "y")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = graft.dedup.Clusters
        .connectedComponents(a.unionByName(b), "x", "y")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      spark.catalog.clearCache()
      got == want
    }
}
