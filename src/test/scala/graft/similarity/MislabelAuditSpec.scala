package graft.similarity

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class MislabelAuditSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  // two tight clusters; vector 4 carries cluster-B geometry but an
  // A label — the planted annotation error
  private val docs = Seq(
    (0L, Seq(1.0f, 0.1f), 1), (1L, Seq(0.9f, 0.0f), 1),
    (2L, Seq(1.1f, 0.05f), 1),
    (3L, Seq(0.0f, 1.0f), 2), (5L, Seq(0.1f, 0.9f), 2),
    (4L, Seq(0.05f, 1.1f), 1)).toDF("vec_id", "embedding", "label")

  private val cfg = KMeans.Config(k = 2)

  test("planted label error is flagged; clean vectors are not") {
    val rows = MislabelAudit.audit(docs, "vec_id", "embedding",
        "label", cfg)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(5))).toMap
    assert(rows(4L) === (2L, true))
    Seq(0L, 1L, 2L).foreach(i => assert(rows(i) === (1L, false), s"v$i"))
    Seq(3L, 5L).foreach(i => assert(rows(i) === (2L, false), s"v$i"))
  }

  test("d_own == d_pred exactly on unflagged rows, > on flagged") {
    val rows = MislabelAudit.audit(docs, "vec_id", "embedding",
        "label", cfg).collect()
    rows.foreach { r =>
      val (dPred, dOwn, bad) =
        (r.getDouble(3), r.getDouble(4), r.getBoolean(5))
      if (bad) assert(dOwn > dPred)
      else assert(dOwn === dPred)
    }
  }

  test("summary rolls up flag counts in ppm") {
    val s = MislabelAudit.auditSummary(docs, "vec_id", "embedding",
        "label", cfg)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(s(1L) === ((4L, 1L, 250000L)))
    assert(s(2L) === ((2L, 0L, 0L)))
  }

  test("audit is deterministic across repartitionings") {
    def run(parts: Int) =
      MislabelAudit.audit(docs.repartition(parts), "vec_id",
          "embedding", "label", cfg)
        .orderBy("vec_id").collect().map(_.toSeq).toSeq
    assert(run(1) === run(7))
  }
}
