package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Covariance-monitor streaming face (#27): running moment state across
  * micro-batches must be BIT-equal to the batch operator over the
  * concatenation (exact integer mergeability, including the 128-bit
  * covariance numerator), and the drift face must flag a genuine
  * correlation flip while leaving a stable stream quiet.
  */
class CovMonitorSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def vecs(rows: Seq[Seq[Float]]) = rows.toDF("embedding")

  test("running state == batch over concatenation, bit-equal") {
    val b1 = Seq(Seq(1f, 2f, 0.5f), Seq(0.25f, -1f, 0.75f))
    val b2 = Seq(Seq(-0.5f, 0.125f, 1f))
    val b3 = Seq(Seq(2f, 1f, -1f), Seq(0.5f, 0.5f, 0.5f))

    val stream = MemoryStream[Seq[Float]](spark)
    var running = Map.empty[(Int, Int), CovMonitor.CellState]
    val q = CovMonitor.monitor(
        stream.toDF().toDF("embedding"),
        baseline = CovMonitor.state(vecs(b1), "embedding"),
        vecCol = "embedding") { (_, _, r) => running = r }
      .start()
    try {
      Seq(b1, b2, b3).foreach { b =>
        stream.addData(b); q.processAllAvailable()
      }
    } finally q.stop()

    val want = CovMonitor.state(vecs(b1 ++ b2 ++ b3), "embedding")
    assert(running === want)
    // the 128-bit numerator agrees with the engine's digit-string col
    val engine = graft.similarity.GramMatrix
      .upperTriangle(vecs(b1 ++ b2 ++ b3), "embedding")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getString(6)).toMap
    for ((cell, st) <- running)
      assert(st.covNum.toString === engine(cell),
        s"cov numerator mismatch at $cell")
  }

  test("drift face flags a correlation flip, stays quiet when stable") {
    // baseline: dims 0 and 1 perfectly correlated
    val base = CovMonitor.state(
      vecs(Seq(Seq(1f, 1f), Seq(-1f, -1f), Seq(0.5f, 0.5f))), "embedding")
    // stable stream: same structure
    val same = CovMonitor.state(
      vecs(Seq(Seq(0.25f, 0.25f), Seq(-0.75f, -0.75f))), "embedding")
    assert(CovMonitor.drift(same, base).forall(_._5 == "NODIFF"))
    // flipped stream: anti-correlated
    val flipped = CovMonitor.state(
      vecs(Seq(Seq(1f, -1f), Seq(-1f, 1f), Seq(0.5f, -0.5f))), "embedding")
    val verdicts = CovMonitor.drift(flipped, base)
    assert(verdicts.exists(v => v._1 == 0 && v._2 == 1 && v._5 == "DRIFT"))
  }

  test("merge is associative and order-independent") {
    val s1 = CovMonitor.state(vecs(Seq(Seq(1f, 0f), Seq(0f, 1f))), "embedding")
    val s2 = CovMonitor.state(vecs(Seq(Seq(0.5f, 0.5f))), "embedding")
    val s3 = CovMonitor.state(vecs(Seq(Seq(-1f, 0.25f))), "embedding")
    val ab_c = CovMonitor.mergeStates(CovMonitor.mergeStates(s1, s2), s3)
    val a_bc = CovMonitor.mergeStates(s1, CovMonitor.mergeStates(s2, s3))
    val cba = CovMonitor.mergeStates(CovMonitor.mergeStates(s3, s2), s1)
    assert(ab_c === a_bc && ab_c === cba)
  }
}
