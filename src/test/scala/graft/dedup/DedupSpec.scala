package graft.dedup

import graft.SparkTestSession
import graft.queries.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dedup family over the sf0.001 documents table (500 docs; the driver
  * planted 25 near-duplicate pairs — a base doc plus a copy with one
  * appended token).
  */
class DedupSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = Tables.load(spark, dir, "documents")

  test("exact dedup keeps one row per text, lowest id wins") {
    val dupes = docs.filter(col("doc_id") % 5 === 0)
      .withColumn("doc_id", col("doc_id") + 100000L)
    val corpus = docs.unionByName(dupes)
    val kept = ExactDedup.byTextHash(corpus, "text", "doc_id")
    assert(corpus.count() === 600)
    assert(kept.count() === 500)
    // keep-best: the re-keyed copies (id >= 100000) must all lose
    assert(kept.filter(col("doc_id") >= 100000L).count() === 0)
  }

  test("minhash LSH finds exactly the exact-Jaccard near-dup pairs") {
    val lsh = MinHashLSH.nearDuplicatePairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = NgramJaccard.nearDuplicatePairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size >= 20) // ~5% of docs are planted near-dup pairs
    // LSH recall is probabilistic in general, but at J>=0.9 with 6
    // bands x 2 rows the miss probability is < 1e-6 per pair — and the
    // hash seeds are fixed, so this is fully deterministic here.
    assert(lsh === exact)
    assert(lsh.forall { case (a, b) => a < b })
  }

  test("minhash verification reports true Jaccard (planted pairs >= 0.9)") {
    val jac = MinHashLSH.nearDuplicatePairs(docs, "doc_id", "text")
      .select("jaccard").collect().map(_.getDouble(0))
    assert(jac.length >= 20)
    // planted pairs differ by ONE token out of >=14, so true J is high —
    // well above the 0.8 keep threshold, never quite 1.0
    assert(jac.forall(j => j >= 0.85 && j < 1.0))
  }

  test("simhash hamming<=3 pairs are a subset of true near-dup pairs") {
    val sh = SimHash.nearDuplicatePairs(
        SimHash.signatures(docs, "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val exact = NgramJaccard.nearDuplicatePairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sh.nonEmpty)
    assert(sh.forall { case (a, b, d) => d >= 0 && d <= 3 && a < b })
    assert(sh.map(t => (t._1, t._2)).toSet.subsetOf(exact))
  }

  test("ngram jaccard frequency cap drops boilerplate-only pairs") {
    // cap=1 keeps only shingles unique to a single doc — no pair can
    // share one, so the join must return nothing
    val capped = NgramJaccard.nearDuplicatePairs(
      docs, "doc_id", "text", maxShingleDocFreq = Some(1L))
    assert(capped.count() === 0)
  }
}
