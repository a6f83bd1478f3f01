package graft.dedup

import graft.SparkTestSession
import graft.queries.Tables
import org.scalatest.funsuite.AnyFunSuite

/** Incremental dedup: a new batch screened against a standing corpus. */
class IncrementalDedupSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val longDoc =
    "the quick brown fox jumps over the lazy dog again and again every day"

  private def verdictsOf(corpus: Seq[(Long, String)],
      batch: Seq[(Long, String)]): Map[Long, (Int, Int, Int)] =
    IncrementalDedup.verdicts(
        corpus.toDF("doc_id", "text"), batch.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3))))
      .toMap

  test("exact copy, near copy, and fresh text get the right verdicts") {
    val v = verdictsOf(
      corpus = Seq(1L -> longDoc, 2L -> "completely different corpus text here"),
      batch = Seq(
        10L -> longDoc, // byte-identical → exact (and near: J = 1)
        11L -> (longDoc + " zzz"), // one appended token → near only
        12L -> "nothing in common with anything at all whatsoever truly"))
    assert(v(10L) === ((1, 1, 0)))
    assert(v(11L) === ((0, 1, 0)))
    assert(v(12L) === ((0, 0, 1)))
  }

  test("within-batch duplicates are out of scope: both kept") {
    // two batch docs identical to each OTHER but absent from the corpus
    val v = verdictsOf(
      corpus = Seq(1L -> "some corpus document with plenty of words inside"),
      batch = Seq(20L -> longDoc, 21L -> longDoc))
    assert(v(20L) === ((0, 0, 1)))
    assert(v(21L) === ((0, 0, 1)))
  }

  test("null-text docs screen as keeps on both sides, SQL null semantics") {
    // null never equals null in SQL: a null-text batch doc must not
    // exact-match a null-text corpus doc, and with no shingles it can't
    // near-match either — it keeps, it never crashes
    val v = verdictsOf(
      corpus = Seq(1L -> longDoc, 2L -> null),
      batch = Seq(10L -> null, 11L -> longDoc))
    assert(v(10L) === ((0, 0, 1)))
    assert(v(11L) === ((1, 1, 0)))
  }

  test("every batch doc gets exactly one verdict row") {
    val batch = Seq(10L -> longDoc, 11L -> (longDoc + " zzz"),
      12L -> "fresh text with no relation to the corpus whatsoever")
    val out = IncrementalDedup.verdicts(
      Seq(1L -> longDoc).toDF("doc_id", "text"),
      batch.toDF("doc_id", "text"), "doc_id", "text")
    assert(out.count() === batch.size)
    assert(out.select("doc_id").distinct().count() === batch.size)
  }

  test("bucketed index tables: identical verdicts, corpus side never re-shuffles") {
    val corpus = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text")
    val batch = Seq(900010L -> longDoc,
      900011L -> "wholly unrelated fresh ingest text for the keep class")
      .toDF("doc_id", "text")
    val cfg = MinHashLSH.Config()
    IncrementalDedup.writeIndex(
      IncrementalDedup.buildIndex(corpus, "doc_id", "text", cfg),
      "graft_idx", numBuckets = 8)
    try {
      val screened = IncrementalDedup.verdicts(
        IncrementalDedup.readIndex(spark, "graft_idx"),
        batch, "doc_id", "text", cfg)
      val want = IncrementalDedup.verdicts(corpus, batch, "doc_id", "text", cfg)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
          r.getInt(3))).toSet
      val got = screened
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
          r.getInt(3))).toSet
      assert(got === want)
      // the recurring-ingest contract: every bucketed corpus scan feeds
      // its join WITHOUT a SHUFFLE above it — walk each bucketed scan
      // upward and require no hash repartition before the first join.
      // A BroadcastExchange is allowed: at test scale AQE may broadcast
      // a tiny corpus table, which still moves no corpus rows through a
      // shuffle (and at production scale the corpus side is never the
      // broadcast candidate).
      val plan = screened.queryExecution.executedPlan.toString
      val lines = plan.linesIterator.toVector
      // marker-based depth: the `*(k) ` codegen prefix makes a
      // codegen'd parent's first CONTENT char sit deeper than a
      // non-codegen child's (BroadcastQueryStage), which made the
      // first-char heuristic skip join lines on the walk (caught by
      // the NoveltySpec sibling of this test)
      def depth(l: String): Int = {
        val i = l.indexOf("+- "); val j = l.indexOf(":- ")
        if (i < 0 && j < 0) 0
        else if (i < 0) j else if (j < 0) i else math.min(i, j)
      }
      val scans = lines.zipWithIndex.filter(_._1.contains("graft_idx"))
        .filter(_._1.contains("Scan"))
      assert(scans.nonEmpty, s"expected bucketed index scans:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"index scans must read bucketed:\n$plan")
      scans.foreach { case (_, si) =>
        var d = depth(lines(si))
        var i = si - 1
        var metJoin = false
        while (i >= 0 && !metJoin) {
          val ld = depth(lines(i))
          if (ld >= 0 && ld < d) { // the next ancestor up the chain
            d = ld
            if (lines(i).contains("Join")) metJoin = true
            else assert(!lines(i).contains("Exchange hashpartitioning"),
              s"a bucketed corpus scan re-shuffles before its join:\n$plan")
          }
          i -= 1
        }
      }
    } finally {
      Seq("graft_idx_bands", "graft_idx_shingles", "graft_idx_hashes")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("deletion-aware index: removing a deleted doc's rows lets its " +
      "near-dup back in (stale rows would wrongly reject)") {
    val corpus = Seq(
      1L -> longDoc,
      2L -> "completely different corpus text here with many words")
      .toDF("doc_id", "text")
    val cfg = MinHashLSH.Config()
    IncrementalDedup.writeIndex(
      IncrementalDedup.buildIndex(corpus, "doc_id", "text", cfg),
      "graft_idx_del", numBuckets = 4)
    try {
      val batch = Seq(30L -> longDoc, 31L -> (longDoc + " zzz"))
        .toDF("doc_id", "text")
      def screen() = IncrementalDedup.verdicts(
          IncrementalDedup.readIndex(spark, "graft_idx_del"),
          batch, "doc_id", "text", cfg)
        .collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3))))
        .toMap
      // doc 1 alive: the exact copy AND the near-dup both reject
      val before = screen()
      assert(before(30L) === ((1, 1, 0)))
      assert(before(31L) === ((0, 1, 0)))
      // the curated table deletes doc 1 (GDPR/retention); the index
      // maintenance is O(|deleted|): tombstone its id and text hash
      IncrementalDedup.removeFromIndex(
        Seq(1L -> longDoc).toDF("doc_id", "text"), "doc_id", "text",
        "graft_idx_del", numBuckets = 4)
      // re-ingest: the deleted doc can no longer reject anyone
      val after = screen()
      assert(after(30L) === ((0, 0, 1)),
        s"exact copy of a DELETED doc must keep: ${after(30L)}")
      assert(after(31L) === ((0, 0, 1)),
        s"near-dup of a DELETED doc must keep: ${after(31L)}")
      // the surviving corpus doc still screens (tombstones are
      // per-doc, not a table wipe)
      val v2 = IncrementalDedup.verdicts(
          IncrementalDedup.readIndex(spark, "graft_idx_del"),
          Seq(40L -> "completely different corpus text here with many words")
            .toDF("doc_id", "text"),
          "doc_id", "text", cfg)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      assert(v2(40L) === 1, "live docs must still screen after a removal")
    } finally {
      Seq("graft_idx_del_hashes", "graft_idx_del_bands",
        "graft_idx_del_shingles", "graft_idx_del_dead",
        "graft_idx_del_hashes_del").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"); ()
      }
    }
  }

  test("a parquet-round-tripped corpus index gives identical verdicts") {
    val corpus = Seq(1L -> longDoc,
      2L -> "some other standing corpus document full of words").toDF("doc_id", "text")
    val batch = Seq(10L -> longDoc, 11L -> (longDoc + " zzz"),
      12L -> "wholly unrelated fresh text for the keep class").toDF("doc_id", "text")
    val cfg = MinHashLSH.Config()
    val tmp = java.nio.file.Files.createTempDirectory("graft-idx").toString
    val built = IncrementalDedup.buildIndex(corpus, "doc_id", "text", cfg)
    built.textHashes.write.parquet(s"$tmp/h")
    built.bands.write.parquet(s"$tmp/bands")
    built.shingles.write.parquet(s"$tmp/shingles")
    // screen against the TABLE-BACKED index — the production path where
    // the corpus is never re-shingled per ingest batch
    val fromDisk = IncrementalDedup.CorpusIndex(
      spark.read.parquet(s"$tmp/h"),
      spark.read.parquet(s"$tmp/bands"),
      spark.read.parquet(s"$tmp/shingles"))
    val got = IncrementalDedup
      .verdicts(fromDisk, batch, "doc_id", "text", cfg)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .toSet
    val want = IncrementalDedup.verdicts(corpus, batch, "doc_id", "text", cfg)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .toSet
    assert(got === want)
    assert(got.map(_._1) === Set(10L, 11L, 12L))
  }

  test("sf0.001 planted batch: 72 exact, 72 near-only, 72 keeps") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val v = graft.queries.DedupQueries
      .dedupIncremental(spark, "/root/testdata/sf0.001")
    val byClass = v.collect()
      .groupBy(r => (r.getInt(1), r.getInt(2), r.getInt(3)))
      .view.mapValues(_.length).toMap
    assert(byClass === Map((1, 1, 0) -> 72, (0, 1, 0) -> 72, (0, 0, 1) -> 72))
    assert(docs.count() === 500)
  }
}
