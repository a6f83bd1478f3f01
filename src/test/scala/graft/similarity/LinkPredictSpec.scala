package graft.similarity

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[LinkPredict.resourceAllocation]] vs a brute-force in-memory
  * replay: symmetrized edge set, per-node degree, RA over shared
  * neighbors of every NON-adjacent pair — including the hub-cap hatch
  * and the minCommon floor.
  */
class LinkPredictSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  /** Deterministic pseudo-random digraph on n nodes. */
  private def edgeList(n: Int, m: Int): Seq[(Long, Long)] =
    (0 until m).map { i =>
      val a = (i * 7919 + 13) % n
      val b = (i * 104729 + 31) % n
      (a.toLong, b.toLong)
    }.filter { case (a, b) => a != b }

  private def bruteRa(edges: Seq[(Long, Long)], minCommon: Int,
      scale: Long, cap: Option[Long]): Map[(Long, Long), (Long, Long)] = {
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (a, b) => a != b }.toSet
    val nbrs = und.groupBy(_._2).map { case (w, s) => w -> s.map(_._1) }
    val centers = cap.fold(nbrs)(c => nbrs.filter(_._2.size <= c))
    val contrib = for {
      (w, xs) <- centers.toSeq
      x <- xs; y <- xs if x < y && !und.contains((x, y))
    } yield ((x, y), scale / nbrs(w).size)
    contrib.groupBy(_._1)
      .map { case (p, ts) => p -> (ts.size.toLong, ts.map(_._2).sum) }
      .filter(_._2._1 >= minCommon)
  }

  private def check(minCommon: Int, cap: Option[Long]): Unit = {
    import spark.implicits._
    val edges = edgeList(20, 60)
    val df = edges.toDF("s", "t")
    val got = LinkPredict
      .resourceAllocation(df, "s", "t", minCommon, topN = 1000,
        scale = 1000000L, maxDegree = cap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
    val want = bruteRa(edges, minCommon, 1000000L, cap)
    assert(got.toMap === want)
    // total (ra DESC, a, b) order held before the cut
    val key = got.map { case ((a, b), (_, ra)) => (-ra, a, b) }
    assert(key.sameElements(key.sorted))
  }

  test("RA scores == brute force, minCommon 2") { check(2, None) }
  test("minCommon 1 keeps single-wedge pairs") { check(1, None) }
  test("hub cap drops over-degree centers only") { check(2, Some(4L)) }

  test("topN cuts after the total order") {
    import spark.implicits._
    val df = edgeList(20, 60).toDF("s", "t")
    val all = LinkPredict.resourceAllocation(df, "s", "t", 1, topN = 1000,
      scale = 1000000L).collect()
    val cut = LinkPredict.resourceAllocation(df, "s", "t", 1, topN = 5,
      scale = 1000000L).collect()
    assert(cut.map(_.toSeq).toSeq === all.take(5).map(_.toSeq).toSeq)
  }
}
