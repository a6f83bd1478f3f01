package graft.operators

import graft.SparkTestSession
import graft.dedup.Clusters
import org.scalatest.funsuite.AnyFunSuite

class GraphAlgsSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** Two 5-cliques {0..4} and {10..14} joined by ONE bridge (4, 10). */
  private def bridgedCliques = {
    def clique(ids: Seq[Long]) =
      for (i <- ids; j <- ids if i < j) yield (i, j)
    (clique(0L to 4L) ++ clique(10L to 14L) :+ (4L, 10L))
      .toDF("a", "b")
  }

  test("LPA keeps bridged cliques apart where CC fuses them") {
    val pairs = bridgedCliques
    val comps = Clusters.connectedComponents(pairs, "a", "b")
      .collect().map(_.getLong(1)).distinct
    assert(comps.length === 1, "CC must see one component — that's the point")
    val lpa = LabelPropagation.communities(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val left = (0L to 4L).map(lpa)
    val right = (10L to 14L).map(lpa)
    assert(left.distinct.length === 1, s"left clique split: $left")
    assert(right.distinct.length === 1, s"right clique split: $right")
    assert(left.head !== right.head,
      "the bridge must not fuse the communities")
  }

  test("LPA is partitioning-invariant (synchronous rounds, total-order ties)") {
    val pairs = bridgedCliques
    val a = LabelPropagation.communities(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val b = LabelPropagation.communities(pairs.repartition(7), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(a === b)
  }

  test("triangles: hand-checkable counts, orientation-independent") {
    // K4 on {0,1,2,3} (4 triangles, 3 through each node), a pendant
    // edge (3,7), and a triangle-free path 20-21-22
    val pairs = Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (3L, 1L), (2L, 3L), // K4
      (3L, 7L),
      (20L, 21L), (22L, 21L)
    ).toDF("a", "b")
    val got = Triangles.perNode(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.catalog.clearCache()
    assert(got === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L,
      7L -> 0L, 20L -> 0L, 21L -> 0L, 22L -> 0L))
  }

  test("personalized pagerank: mass flows only from the seed set") {
    // a → b → c, plus d → a (d reaches the seed but is unreachable
    // FROM it): rank must be positive exactly on {a, b, c}
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("d", "a", 1L))
      .toDF("src", "dst", "w")
    val r = PageRank.personalizedRanks(edges, "src", "dst", "w",
        seeds = Seq("a"), iters = 5)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("a") > 0 && r("b") > 0 && r("c") > 0)
    assert(r("d") === 0L, "a node unreachable from the seeds has no mass")
    assert(r("a") > r("b") && r("b") > r("c"),
      "proximity to the seed must decay along the chain")
  }

  test("triangles: duplicate and reversed input pairs do not double-count") {
    val pairs = Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 0L), (0L, 2L))
      .toDF("a", "b")
    val got = Triangles.perNode(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.catalog.clearCache()
    assert(got === Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }
}
