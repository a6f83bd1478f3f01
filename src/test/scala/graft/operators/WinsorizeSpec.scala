package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Winsorize contract on a hand-computable frame, plus partitioning
  * invariance of the rank-window bounds.
  */
class WinsorizeSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("clips to the exact p01/p99 band; fixed-point sum matches by hand") {
    // values 1..100 in one group: lo bound = 1st smallest = 1,
    // hi bound = 99th = 99; only 100 clips (down to 99)
    val df = (1 to 100).map(v => ("g", v.toDouble)).toDF("grp", "value")
    val out = Winsorize.clippedStats(df, "grp", "value").collect().head
    assert(out.getLong(1) === 100L)                   // n
    assert(out.getLong(2) === 0L)                     // n_clipped_lo
    assert(out.getLong(3) === 1L)                     // n_clipped_hi
    val expected = ((1 to 99).map(_ * 100L).sum + 99L * 100L)
    assert(out.getLong(4) === expected)               // sum of round(v*100)
  }

  test("bounds and sums are partitioning-invariant") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 500).map(i =>
      (s"g${i % 3}", rnd.nextDouble() * 20 - 5)).toDF("grp", "value")
    def run(d: org.apache.spark.sql.DataFrame) =
      Winsorize.clippedStats(d, "grp", "value").orderBy("grp")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
    assert(run(df) === run(df.repartition(13)))
  }

  test("rejects inverted or out-of-range bands") {
    val df = Seq(("g", 1.0)).toDF("grp", "value")
    intercept[IllegalArgumentException](
      Winsorize.clippedStats(df, "grp", "value", lo = 0.9, hi = 0.1))
    intercept[IllegalArgumentException](
      Winsorize.clippedStats(df, "grp", "value", lo = 0.0, hi = 0.99))
  }
}
