package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Modularity.byCommunity]] vs textbook arithmetic on graphs with
  * known structure: the two-clique bridge graph under its true
  * partition scores high Q, under a degenerate one-community partition
  * exactly Q = 0, and the per-community terms match brute force.
  */
class ModularitySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  // two 4-cliques (0-3, 4-7) + one bridge 3-4: m = 13
  private val cliqueEdges: Seq[(Long, Long)] =
    (for { a <- 0 until 4; b <- a + 1 until 4 } yield (a.toLong, b.toLong)) ++
      (for { a <- 4 until 8; b <- a + 1 until 8 } yield (a.toLong, b.toLong)) ++
      Seq((3L, 4L))

  private def run(edges: Seq[(Long, Long)], labels: Seq[(Long, Long)]) = {
    import spark.implicits._
    Modularity.byCommunity(edges.toDF("a", "b"), "a", "b",
        labels.toDF("id", "community"), "id", "community")
      .orderBy("community").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
  }

  private def brute(edges: Seq[(Long, Long)], labels: Map[Long, Long]) = {
    val m = edges.size.toLong
    val deg = edges.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    labels.values.toSeq.distinct.sorted.map { c =>
      val nodes = labels.filter(_._2 == c).keySet
      val intra = edges.count { case (a, b) =>
        nodes(a) && nodes(b) }.toLong
      val ds = nodes.toSeq.map(deg).sum
      (c, nodes.size.toLong, intra, ds, 4 * m * intra - ds * ds)
    }
  }

  test("per-community terms == brute force on the bridge graph") {
    val labels = (0L until 8L).map(i => i -> (if (i < 4) 0L else 1L))
    assert(run(cliqueEdges, labels).toSeq === brute(cliqueEdges, labels.toMap))
    // headline Q for the true partition is strongly positive
    val q = brute(cliqueEdges, labels.toMap).map(_._5).sum.toDouble /
      (4.0 * 13 * 13)
    assert(q > 0.3)
  }

  test("one-community partition scores exactly Q = 0") {
    val labels = (0L until 8L).map(i => i -> 0L)
    val rows = run(cliqueEdges, labels)
    assert(rows.length === 1)
    // intra = m and deg_sum = 2m, so q_num = 4m² − 4m² = 0
    assert(rows.head._5 === 0L)
  }

  test("anti-structure partition scores negative") {
    // split each clique across the two communities
    val labels = (0L until 8L).map(i => i -> (i % 2))
    val q = run(cliqueEdges, labels).map(_._5).sum
    assert(q < 0L)
  }
}
