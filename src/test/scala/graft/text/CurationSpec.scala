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

  test("audit: kept set equals curate; every verdict class is justified") {
    val cfg = Curation.Config()
    val audit = Curation.curateAudit(docs, "doc_id", "text", cfg).collect()
    assert(audit.length === docs.count()) // EVERY doc gets a verdict
    val byVerdict = audit.groupBy(_.getString(3))
    // kept rows are exactly curate's output
    val curKept = Curation.curate(docs, "doc_id", "text", cfg)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(byVerdict("kept").map(_.getLong(0)).toSet === curKept)
    // dropped-by-stage rows each violate exactly their stage's gate
    byVerdict.getOrElse("quality", Array()).foreach(r =>
      assert(r.isNullAt(1) || r.getDouble(1) < cfg.minQuality))
    byVerdict.getOrElse("language", Array()).foreach(r =>
      assert(r.getString(2) != cfg.lang))
    // every dedup drop names a surviving lower-id representative
    (byVerdict.getOrElse("exact_dup", Array()) ++
      byVerdict.getOrElse("near_dup", Array())).foreach { r =>
        assert(!r.isNullAt(4) && r.getLong(4) < r.getLong(0))
      }
    // kept and quality/language drops name no one
    byVerdict("kept").foreach(r => assert(r.isNullAt(4)))
  }

  test("audit: planted docs land in each verdict class") {
    import spark.implicits._
    val en = "the quick brown fox jumps over a lazy dog and then walks " +
      "back home with other animals during this quiet evening while " +
      "birds sing from tall green trees near clear running water as " +
      "children play games outside their warm little houses before " +
      "dinner is finally served to everyone around that big wooden table"
    val planted = Seq(
      (1L, en),                          // kept
      (2L, en),                          // exact dup of 1
      (3L, en + " tiny extra words here"), // near dup of 1
      (4L, "zz zz zz zz zz zz zz zz"),   // low diversity -> quality
      (5L, "der schnelle braune fuchs springt gern weit über einen " +
        "faulen hund und läuft dann wieder nach hause zu den anderen " +
        "tieren während vögel von hohen grünen bäumen singen als kinder " +
        "draußen vor ihren warmen kleinen häusern viele schöne spiele " +
        "spielen bevor das abendessen endlich allen am großen tisch " +
        "serviert wird"))
      .toDF("doc_id", "text")
    val a = Curation.curateAudit(planted, "doc_id", "text",
        Curation.Config(lsh = graft.dedup.MinHashLSH.Config(threshold = 0.5)))
      .collect().map(r => r.getLong(0) ->
        (r.getString(3), if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(a(1L) === (("kept", -1L)))
    assert(a(2L) === (("exact_dup", 1L)))
    assert(a(3L) === (("near_dup", 1L)))
    assert(a(4L)._1 === "quality")
    assert(a(5L)._1 === "language")
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

  test("funnel: fixed stage rows, conserved counts, final row equals curate") {
    val cfg = Curation.Config()
    val rows = Curation.funnel(docs, "doc_id", "text", cfg)
      .orderBy("stage_idx").collect()
    // fixed shape even when a stage drops nothing
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("input", "exact_dup", "quality", "language", "near_dup"))
    val totalDocs = docs.count()
    val totalToks = docs
      .agg(sum(size(split(lower(col("text")), " ")))).head().getLong(0)
    assert(rows.head.getLong(2) === 0L && rows.head.getLong(3) === 0L)
    assert(rows.head.getLong(4) === totalDocs &&
      rows.head.getLong(5) === totalToks)
    // each row's remainder is the previous remainder minus its drops
    rows.sliding(2).foreach { case Array(prev, cur) =>
      assert(cur.getLong(4) === prev.getLong(4) - cur.getLong(2))
      assert(cur.getLong(5) === prev.getLong(5) - cur.getLong(3))
    }
    // the funnel's final remainder IS the curated corpus
    val kept = Curation.curate(docs, "doc_id", "text", cfg)
    assert(rows.last.getLong(4) === kept.count())
    spark.catalog.clearCache()
  }

  test("per-source funnel sums to the corpus funnel, stage by stage") {
    val cfg = Curation.Config()
    val whole = Curation.funnel(docs, "doc_id", "text", cfg)
      .collect().map(r => r.getInt(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val bySrc = Curation
      .funnelBy(docs, "doc_id", "text", Seq("source"), cfg)
      .collect()
      .groupBy(_.getInt(2)) // stage_idx
      .view.mapValues(rs => (rs.map(_.getLong(3)).sum,
        rs.map(_.getLong(4)).sum, rs.map(_.getLong(5)).sum,
        rs.map(_.getLong(6)).sum)).toMap
    // every source reports the full fixed stage shape
    assert(bySrc.keySet === whole.keySet)
    for ((idx, (d, t, dl, tl)) <- bySrc) {
      assert((d, t, dl, tl) === whole(idx),
        s"stage $idx: source breakdown does not sum to the corpus funnel")
    }
    spark.catalog.clearCache()
  }
}
