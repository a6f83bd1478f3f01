package graft.streaming

import graft.SparkTestSession
import graft.similarity.EmbedDrift
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Embedding-drift streaming face: running states across micro-batches
  * must equal the batch state of the concatenation (exact fixed-point
  * mergeability), the reported cosine must be BIT-equal to the batch
  * operator's column, and the verdict set must track label presence.
  */
class EmbedDriftStreamSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val baselineRows = Seq(
    (0L, 0L, Seq(1f, 0f, 0f)), (1L, 0L, Seq(0.9f, 0.1f, 0f)),
    (2L, 1L, Seq(0f, 1f, 0f)), (3L, 1L, Seq(0f, 0.95f, 0.05f)))

  test("running monitor == batch over concatenation; cosine bit-equal to the engine") {
    val baseline = EmbedDriftStream.state(
      baselineRows.toDF("vec_id", "label", "embedding"), "label", "embedding")

    // batch 1: label 0 stays put; batch 2: label 1 rotates, label 7 is new
    val b1 = Seq((10L, 0L, Seq(0.95f, 0.05f, 0f)))
    val b2 = Seq((11L, 1L, Seq(0.7f, 0.3f, 0f)), (12L, 7L, Seq(0f, 0f, 1f)))

    val stream = MemoryStream[(Long, Long, Seq[Float])](spark)
    var verdicts = Seq.empty[(Long, String, Double)]
    var running = Map.empty[Long, EmbedDriftStream.LabelState]
    val q = EmbedDriftStream.monitor(
        stream.toDF().toDF("vec_id", "label", "embedding"),
        baseline, "label", "embedding", minCos = 0.95) {
      (_, v, r) => verdicts = v; running = r }
      .start()
    try {
      Seq(b1, b2).foreach { b => stream.addData(b); q.processAllAvailable() }
    } finally q.stop()

    // running == batch state of the concatenated stream
    val want = EmbedDriftStream.state(
      (b1 ++ b2).toDF("vec_id", "label", "embedding"), "label", "embedding")
    assert(running === want)

    val byLabel = verdicts.map(v => v._1 -> v).toMap
    assert(byLabel(0L)._2 === "NODIFF")
    assert(byLabel(1L)._2 === "DRIFT")
    assert(byLabel(7L)._2 === "ADDED")

    // the driver-side cosine is bit-equal to the engine's column
    val engine = EmbedDrift.centroidShift(
        baselineRows.toDF("vec_id", "label", "embedding"),
        (b1 ++ b2).toDF("vec_id", "label", "embedding"),
        "label", "embedding")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // centroidShift(baseline, running) orients a→b like drift(b, a)
    assert(byLabel(0L)._3 === engine(0L))
    assert(byLabel(1L)._3 === engine(1L))
  }
}
