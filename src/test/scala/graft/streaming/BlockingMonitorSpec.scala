package graft.streaming

import graft.SparkTestSession
import graft.dedup.{BlockingEval, MinHashLSH}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** [[BlockingMonitor]]: the running blocking-quality counters after
  * every micro-batch equal [[BlockingEval.eval]] of the concatenation
  * — the incremental ≡ recompute identity, with pairs attributed to
  * their later document's batch (within-batch, cross-batch, and
  * out-of-order-id cross pairs all covered by the fixture).
  */
class BlockingMonitorSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  // ≥12-word docs so 3-shingle Jaccard has room (playbook note); the
  // sample bound (id < 100) covers most docs but NOT 150/151, whose
  // candidate pair must count toward n_cand and not the sample side.
  private val base = "the quick brown fox jumps over the lazy dog " +
    "near the riverbank today"
  private def doc(id: Long, text: String) = (id, text)
  private val b1 = Seq(
    doc(1L, base),
    doc(2L, base + " extra"),                // near-dup of 1, same batch
    doc(50L, "completely different words about spark engines and " +
      "distributed shuffles in production pipelines"))
  private val b2 = Seq(
    doc(3L, base + " again"),                // near-dup of 1/2, CROSS batch
    doc(150L, "unique payload one with many additional filler words " +
      "for shingling purposes here"))
  private val b3 = Seq(
    doc(0L, base),                           // SMALLER id than batch-1 docs
    doc(151L, "unique payload one with many additional filler words " +
      "for shingling purposes here"))        // exact dup of 150, outside sample

  private val cfg = MinHashLSH.Config()
  private val SampleMax = 100L

  test("running counters == batch eval of the concatenation, per batch") {
    val stream = MemoryStream[(Long, String)](spark)
    var reports = List.empty[(Long, BlockingMonitor.BlockState)]
    val q = BlockingMonitor.monitor(
        stream.toDF().toDF("doc_id", "text"), "doc_id", "text", SampleMax,
        cfg) { (id, s) => reports ::= (id, s) }
      .start()
    try {
      Seq(b1, b2, b3).foreach { b =>
        stream.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    assert(reports.size === 3)

    val prefixes = Seq(b1, b1 ++ b2, b1 ++ b2 ++ b3)
    reports.reverse.zip(prefixes).zipWithIndex.foreach {
      case (((_, got), prefix), i) =>
        val want = BlockingEval.eval(
            prefix.toDF("doc_id", "text"), "doc_id", "text", SampleMax, cfg)
          .collect().head
        val wantState = BlockingMonitor.BlockState(
          want.getAs[Long]("n_docs"), want.getAs[Long]("n_cand"),
          want.getAs[Long]("n_truth"), want.getAs[Long]("n_hit"),
          want.getAs[Long]("n_cand_s"))
        assert(got === wantState, s"after batch ${i + 1}")
        spark.catalog.clearCache()
    }
    // the final corpus genuinely exercises every counter
    val last = reports.head._2
    assert(last.nDocs === 7L)
    assert(last.nTruth >= 3L, "expected the 0/1/2/3 near-dup cluster")
    assert(last.nCand > last.nCandS,
      "the out-of-sample 150/151 exact pair must be a candidate")
  }

  test("report renders the identical one-row shape as the batch audit") {
    val all = (b1 ++ b2 ++ b3).toDF("doc_id", "text")
    val batch = BlockingEval.eval(all, "doc_id", "text", SampleMax, cfg)
      .collect().head
    val acc = new BlockingMonitor.Accumulator("doc_id", "text", SampleMax, cfg)
    val s = acc.fold(all)
    val streamed = BlockingMonitor.report(spark, s).collect().head
    assert(streamed === batch)
  }

  test("df-capped configs are rejected (not additive across batches)") {
    intercept[IllegalArgumentException] {
      new BlockingMonitor.Accumulator("doc_id", "text", SampleMax,
        MinHashLSH.Config(maxShingleDocFreq = Some(10L)))
    }
  }
}
