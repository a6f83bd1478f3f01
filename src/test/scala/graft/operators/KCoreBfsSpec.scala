package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class KCoreBfsSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** A 4-clique {0..3}, a tail 3-8-9 hanging off it, and an isolated
    * edge (20, 21): the clique is a 3-core, the tail and the isolated
    * edge peel away at k = 2 within two rounds (9 and 21/20 have
    * degree 1; removing them leaves 8 at degree 1, then nothing).
    */
  private def cliqueWithTail = {
    val clique = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j)
    (clique ++ Seq((3L, 8L), (8L, 9L), (20L, 21L))).toDF("a", "b")
  }

  test("k-core peels tails and isolated edges, keeps the clique") {
    val got = KCore.peel(cliqueWithTail, "a", "b", k = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the 4-clique survives with its internal degree 3; everything
    // else (tail 8-9, pendant at 3, edge 20-21) is gone
    assert(got === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("k-core at k above the max degree empties the graph") {
    val got = KCore.peel(cliqueWithTail, "a", "b", k = 4, rounds = 2)
    assert(got.count() === 0L)
  }

  test("one round only strips the current fringe (round-gated, not converged)") {
    // after ONE round only degree-1 nodes {9, 20, 21} are gone; node 8
    // (degree 2 before the peel) survives the round with its residual
    // degree 1 — exactly the deterministic i-th peel state the oracle
    // replays
    val got = KCore.peel(cliqueWithTail, "a", "b", k = 2, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 3L, 1L -> 3L, 2L -> 3L,
      3L -> 4L, 8L -> 1L))
  }

  test("k-core is partitioning-invariant") {
    val a = KCore.peel(cliqueWithTail, "a", "b", 2, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = KCore.peel(cliqueWithTail.repartition(7), "a", "b", 2, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }

  /** Path 0-1-2-3-4-5 plus a branch 2-10: hop distances from seed 0
    * are the path positions; 10 sits at 3 hops via 2.
    */
  private def pathGraph = Seq(
    (0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (2L, 10L)
  ).toDF("a", "b")

  test("BFS min-hop distances from a single seed") {
    val seeds = Seq(0L).toDF("id")
    val got = BfsHops.minHops(pathGraph, "a", "b", seeds, maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // node 5 is 5 hops away — beyond maxHops = 4, so absent
    assert(got === Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3,
      10L -> 3, 4L -> 4))
  }

  test("multi-source BFS takes the minimum over seeds") {
    val seeds = Seq(0L, 5L).toDF("id")
    val got = BfsHops.minHops(pathGraph, "a", "b", seeds, maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(0L -> 0, 5L -> 0, 1L -> 1, 4L -> 1,
      2L -> 2, 3L -> 2))
  }

  test("seeds outside the edge set still appear at hop 0") {
    val seeds = Seq(99L).toDF("id")
    val got = BfsHops.minHops(pathGraph, "a", "b", seeds, maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(99L -> 0))
  }

  test("BFS is partitioning-invariant") {
    val seeds = Seq(0L, 10L).toDF("id")
    val a = BfsHops.minHops(pathGraph, "a", "b", seeds, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val b = BfsHops.minHops(pathGraph.repartition(5), "a", "b",
        seeds.repartition(2), 3)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(a === b)
  }
}
