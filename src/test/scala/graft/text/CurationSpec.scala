package graft.text

import graft.SparkTestSession
import graft.dedup.{MinHashLSH, NgramJaccard}
import graft.queries.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = Tables.load(spark, dir, "documents")

  test("curation keeps a nonempty subset meeting every stage's contract") {
    val cfg = Curation.Config()
    val kept = Curation.curate(docs, "doc_id", "text", cfg).collect()
    assert(kept.nonEmpty && kept.length < docs.count())
    kept.foreach { r =>
      assert(r.getString(1) === cfg.lang)
      assert(r.getDouble(2) >= cfg.minQuality)
    }
    // near-dedup: no kept pair may be a verified near-duplicate
    val keptIds = kept.map(_.getLong(0)).toSet
    val pairs = NgramJaccard.nearDuplicatePairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      assert(!(keptIds(a) && keptIds(b)),
        s"near-dup pair ($a,$b) both survived curation")
    }
  }

  test("keep-first policy: the lower id of each surviving pair is the one kept") {
    val cfg = Curation.Config(minQuality = 0.0, lang = "en")
    val kept = Curation.curate(docs, "doc_id", "text", cfg)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val enDocs = LangId.predict(docs, "doc_id", "text")
      .filter(col("lang_pred") === "en")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val pairs = MinHashLSH.nearDuplicatePairs(docs, "doc_id", "text", cfg.lsh)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => enDocs(a) && enDocs(b) }
    assert(pairs.nonEmpty)
    val losers = pairs.map(_._2).toSet
    pairs.foreach { case (a, b) =>
      assert(!kept(b), s"higher id $b of pair ($a,$b) must be dropped")
      // the lower id survives unless it is itself the loser of another pair
      assert(kept(a) || losers(a), s"lower id $a of pair ($a,$b) must be kept")
    }
  }
}
