package graft.text

import java.util.zip.Deflater

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[CompressionRatio]] / [[graft.expressions.DeflateLength]]:
  * distributed values equal a driver-side zlib replay byte-for-byte,
  * the redundancy ordering the filter exists for holds, and the
  * projection is partitioning-invariant.
  */
class CompressionRatioSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def zlibLen(s: String): Long = {
    val d = new Deflater(6, true)
    d.setInput(s.getBytes("UTF-8")); d.finish()
    val buf = new Array[Byte](8192)
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    d.end()
    n
  }

  private val docs = Seq(
    (1L, "spam spam spam spam spam spam spam spam spam spam"),
    (2L, "The quick brown fox jumps over the lazy dog near the river."),
    (3L, "q8Zk2pV9mL4xW7cJ1bN6tR3yH5gD0fS8aQ2eK9uM4iO7"),
    (4L, ""),
    (5L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"))

  test("metrics == driver-side zlib replay; empty doc gets null ratio") {
    import spark.implicits._
    val got = CompressionRatio
      .metrics(docs.toDF("doc_id", "text").repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect()
    docs.zip(got).foreach { case ((id, t), r) =>
      assert(r.getLong(0) === id)
      assert(r.getLong(1) === t.getBytes("UTF-8").length.toLong)
      assert(r.getLong(2) === zlibLen(t), s"deflate_len at doc $id")
      if (t.isEmpty) assert(r.isNullAt(3))
      else assert(r.getLong(3) === 1000000L * zlibLen(t) / t.getBytes("UTF-8").length)
    }
  }

  test("redundancy ordering: repeated << prose << random-ish") {
    import spark.implicits._
    val m = CompressionRatio
      .metrics(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.get(3)).toMap
    def ppm(id: Long) = m(id).asInstanceOf[Long]
    assert(ppm(5L) < ppm(1L))
    assert(ppm(1L) < ppm(2L))
    assert(ppm(2L) < ppm(3L))
  }

  test("keep band drops both tails and empty docs") {
    import spark.implicits._
    val kept = CompressionRatio.keep(docs.toDF("doc_id", "text"),
        "doc_id", "text", loPpm = 300000L, hiPpm = 960000L)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L))
  }
}
