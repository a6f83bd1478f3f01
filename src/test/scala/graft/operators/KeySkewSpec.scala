package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class KeySkewSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def profile(keys: Seq[String]) =
    KeySkew.profile(keys.map(Tuple1(_)).toDF("k"), "k").collect().head

  test("profile == driver replay on a skewed column") {
    // 6×a, 2×b, 1×c, 1×null
    val keys = Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c", null)
    val r = profile(keys)
    assert(r.getLong(0) === 10L) // n
    assert(r.getLong(1) === 4L)  // n_keys (null is a key)
    assert(r.getLong(2) === 6L)  // max_cnt
    assert(r.getLong(3) === 600000L) // top1 share
    // hhi = (36+4+1+1)*1e6/100 = 420000
    assert(r.getLong(4) === 420000L)
  }

  test("uniform key scores hhi = 1e6 / n_keys; single key scores 1e6") {
    val uniform = profile((1 to 8).map(i => s"k$i"))
    assert(uniform.getLong(3) === 125000L)
    assert(uniform.getLong(4) === 125000L)
    val single = profile(Seq.fill(5)("only"))
    assert(single.getLong(3) === 1000000L)
    assert(single.getLong(4) === 1000000L)
  }

  test("deterministic across repartitionings") {
    val df = (1 to 1000).map(i => s"k${i % 37}").map(Tuple1(_)).toDF("k")
    val a = KeySkew.profile(df.repartition(1), "k").collect().head.toSeq
    val b = KeySkew.profile(df.repartition(13), "k").collect().head.toSeq
    assert(a === b)
  }
}
