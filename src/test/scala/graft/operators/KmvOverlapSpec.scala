package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class KmvOverlapSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def row(r: org.apache.spark.sql.Row) =
    (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
        r.getDouble(6))

  test("exact regime: sketches below k report exact overlap") {
    // A = {0..19}, B = {10..29} (overlap 10, union 30), C disjoint
    val df = ((0 until 20).map(i => ("a", s"v$i")) ++
        (10 until 30).map(i => ("b", s"v$i")) ++
        (100 until 110).map(i => ("c", s"v$i")))
      .toDF("grp", "v")
    val got = KmvSketch.pairwiseOverlap(df, "grp", "v", k = 64)
      .collect().map(row).toMap
    assert(got.size === 3, "3 pairs for 3 groups")
    val (thetaAb, commonAb, unionAb, jacAb, interAb) = got(("a", "b"))
    assert(thetaAb === KmvSketch.HashSpaceLong,
      "whole-population sketches carry theta = 2^48")
    assert(commonAb === 10L && unionAb === 30L)
    assert(jacAb === 10.0 / 30.0)
    assert(interAb === 10.0, "exact regime: est_inter = |A ∩ B|")
    val (_, commonAc, _, jacAc, interAc) = got(("a", "c"))
    assert(commonAc === 0L && jacAc === 0.0 && interAc === 0.0,
      "disjoint pairs appear with zero overlap")
  }

  test("estimate regime: sampled Jaccard tracks truth on big sets") {
    // A = {0..1999}, B = {1000..2999}: true Jaccard 1000/3000 = 1/3
    val df = ((0 until 2000).map(i => ("a", s"x$i")) ++
        (1000 until 3000).map(i => ("b", s"x$i")))
      .toDF("grp", "v")
    val got = KmvSketch.pairwiseOverlap(df, "grp", "v", k = 256)
      .collect().map(row).toMap
    val (theta, common, union, jac, inter) = got(("a", "b"))
    assert(theta < KmvSketch.HashSpaceLong, "sampling regime")
    assert(union > 0 && common > 0)
    // k = 256 bottom-k Jaccard: generous 2σ-ish band around 1/3
    assert(jac > 0.20 && jac < 0.47, s"jaccard estimate off: $jac")
    // distinct-intersection estimate around 1000
    assert(inter > 500 && inter < 1500, s"intersection estimate off: $inter")
  }

  test("partitioning-invariant (md5 determinism)") {
    val df = ((0 until 500).map(i => ("a", s"x$i")) ++
        (250 until 750).map(i => ("b", s"x$i")))
      .toDF("grp", "v")
    val a = KmvSketch.pairwiseOverlap(df, "grp", "v", k = 64)
      .collect().map(row).toSet
    val b = KmvSketch.pairwiseOverlap(df.repartition(11), "grp", "v", 64)
      .collect().map(row).toSet
    assert(a === b)
  }
}
