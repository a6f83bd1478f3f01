package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class PageRankSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** Driver-side reference: the exact integer recurrence from the
    * scaladoc, executed naively over in-memory maps.
    */
  private def reference(edges: Seq[(String, String, Long)],
      iters: Int): Map[String, Long] = {
    val S = PageRank.Scale
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val outw = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val n = nodes.size
    var r = nodes.map(_ -> S / n).toMap
    val base = 3L * S / (20L * n)
    for (_ <- 1 to iters) {
      val m = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _, w) => w * (r(u) / outw(u)) }.sum).toMap
      r = nodes.map(v => v -> (base + 17L * m.getOrElse(v, 0L) / 20L)).toMap
    }
    r
  }

  private def run(edges: Seq[(String, String, Long)],
      iters: Int): Map[String, Long] =
    PageRank.ranks(edges.toDF("s", "d", "w"), "s", "d", "w", iters)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap

  test("symmetric cycle stays (almost) uniform") {
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L))
    val got = run(edges, 5)
    assert(got === reference(edges, 5))
    assert(got.values.toSet.size === 1, "cycle must stay uniform")
  }

  test("sink accumulates, source keeps only teleport mass") {
    // a -> b, a -> c, b -> c; c dangling (its mass leaks, by contract)
    val edges = Seq(("a", "b", 1L), ("a", "c", 1L), ("b", "c", 1L))
    val got = run(edges, 3)
    assert(got === reference(edges, 3))
    assert(got("c") > got("b") && got("b") > got("a"))
  }

  test("edge weights steer mass") {
    val heavy = Seq(("a", "b", 9L), ("a", "c", 1L))
    val got = run(heavy, 2)
    assert(got === reference(heavy, 2))
    assert(got("b") > got("c"))
  }

  test("matches the reference on a pseudo-random 60-node graph") {
    // deterministic LCG edges; multi-edges collapse into weights
    val raw = Iterator.iterate(12345L)(x => (x * 48271) % 2147483647)
      .drop(1).take(400).toSeq
    val edges = raw.grouped(2).collect { case Seq(x, y) =>
      (s"n${x % 60}", s"n${y % 60}", 1L + (x % 3))
    }.toSeq.groupBy(e => (e._1, e._2)).map { case ((u, v), g) =>
      (u, v, g.map(_._3).sum)
    }.toSeq.filter { case (u, v, _) => u != v }
    val got = run(edges, 4)
    assert(got === reference(edges, 4))
  }

  test("rounds reuse the pre-partitioned edge frame (no per-round edge shuffle)") {
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L))
    val df = PageRank.ranks(edges.toDF("s", "d", "w"), "s", "d", "w", 3)
    val plan = df.queryExecution.executedPlan.toString
    // the last round's plan: its inputs are checkpointed RDD scans; the
    // edge side must arrive already hash-partitioned (no fresh Exchange
    // feeding the join from a scan of the edge RDD)
    assert(plan.contains("Scan ExistingRDD"),
      s"rounds must consume checkpointed frames:\n$plan")
  }
}
