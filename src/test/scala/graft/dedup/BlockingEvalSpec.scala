package graft.dedup

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class BlockingEvalSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  // 0/1 near-identical (true match), 2 a distinct doc, 3/4 identical
  // (true match), 5 short (no shingles)
  private val docs = Seq(
    // 12 words; only the last differs -> 9 of 10 shingles shared,
    // jaccard 9/(10+10-9) = 0.818 >= 0.8
    (0L, "the quick brown fox jumps over the lazy dog in the morning"),
    (1L, "the quick brown fox jumps over the lazy dog in the evening"),
    (2L, "completely different text about astronomy and far galaxies"),
    (3L, "exact duplicate sentence body for the pair check here"),
    (4L, "exact duplicate sentence body for the pair check here"),
    (5L, "too short")).toDF("doc_id", "text")

  private val cfg = MinHashLSH.Config()

  test("counts and ratios == driver replay") {
    val r = BlockingEval.eval(docs, "doc_id", "text", sampleMax = 100L,
      cfg).collect().head
    val nDocs = 6L
    assert(r.getLong(0) === nDocs)
    val nCand = r.getLong(1)
    val nTruth = r.getLong(2)
    val nHit = r.getLong(3)
    val nCandS = r.getLong(4)
    // truth: {0,1} and {3,4}
    assert(nTruth === 2L)
    // LSH at 12 hashes finds identical docs always; {3,4} must hit
    assert(nHit >= 1L && nHit <= 2L)
    // sample covers everything -> n_cand_s == n_cand
    assert(nCandS === nCand)
    assert(r.getLong(5) ===
      1000000L - nCand * 1000000L / (nDocs * (nDocs - 1) / 2))
    assert(r.getLong(6) === nHit * 1000000L / nTruth)
    if (nCandS > 0) assert(r.getLong(7) === nHit * 1000000L / nCandS)
  }

  test("sample bound restricts truth but not the corpus-wide census") {
    val full = BlockingEval.eval(docs, "doc_id", "text", 100L, cfg)
      .collect().head
    val sampled = BlockingEval.eval(docs, "doc_id", "text", 3L, cfg)
      .collect().head
    // RR inputs identical
    assert(sampled.getLong(0) === full.getLong(0))
    assert(sampled.getLong(1) === full.getLong(1))
    assert(sampled.getLong(5) === full.getLong(5))
    // truth within doc_id < 3 is only {0,1}
    assert(sampled.getLong(2) === 1L)
  }

  test("perfect blocking on planted duplicates keeps PC = 1e6") {
    val dups = (0L until 10L).map(i =>
      (i, s"shared duplicate content body number ${i % 2} end"))
      .toDF("doc_id", "text")
    val r = BlockingEval.eval(dups, "doc_id", "text", 100L, cfg)
      .collect().head
    // identical texts share every band; all true pairs are candidates
    assert(r.getLong(6) === 1000000L)
  }
}
