package graft.dedup

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Prefix filtering is only worth having if it is EXACT — these specs
  * pin result equality with the full postings join (the family's
  * already-gated exact form) and the candidate-fanout reduction that
  * justifies the extra df pass.
  */
class PrefixFilterJoinSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def pairsOf(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e12) / 1e12))
      .toSet

  test("prefix-filter pairs == full postings-join pairs on real data") {
    val docs = graft.queries.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
    val full = pairsOf(
      NgramJaccard.nearDuplicatePairs(docs, "doc_id", "text"))
    val pfx = pairsOf(
      PrefixFilterJoin.nearDuplicatePairs(docs, "doc_id", "text"))
    spark.catalog.clearCache()
    assert(full.nonEmpty, "fixture must actually contain near-dup pairs")
    assert(pfx === full)
  }

  test("completeness holds across thresholds, including exact-integral t·n") {
    // 10-token docs at t = 0.8 make t·n exactly integral — the ceil
    // boundary case; overlapping word windows give graded similarities
    val base = (0 until 10).map(i => s"w$i").mkString(" ")
    val docs = (0L until 12L).map { d =>
      val words = (0 until 10).map(i => s"w${i + d}").mkString(" ")
      (d, if (d < 3) base else words)
    }.toDF("doc_id", "text")
    for (t <- Seq(0.5, 0.8, 1.0)) {
      val full = pairsOf(NgramJaccard
        .nearDuplicatePairs(docs, "doc_id", "text", threshold = t))
      val pfx = pairsOf(PrefixFilterJoin
        .nearDuplicatePairs(docs, "doc_id", "text", threshold = t))
      spark.catalog.clearCache()
      assert(pfx === full, s"mismatch at threshold $t")
    }
  }

  test("boilerplate shingles stop fanning out: prefix candidates ≪ postings pairs") {
    // 60 docs sharing an 8-word footer: the full join fans out ~C(60,2)
    // pairs through every footer shingle; the footer shingles have
    // df = 60 and sort LAST, so almost none enter any prefix
    val footer = (0 until 8).map(i => s"foot$i").mkString(" ")
    val docs = (0L until 60L).map { d =>
      val body = (0 until 12).map(i => s"b${d}_$i").mkString(" ")
      (d, s"$body $footer")
    }.toDF("doc_id", "text")

    // count DISTINCT co-occurring pairs each strategy generates before
    // verification — the shuffle-volume driver at scale
    val posts = NgramJaccard.hashedShingles(docs, "doc_id", "text", 3)
      .persist()
    val fullCand = posts.as("a")
      .join(posts.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select("a.doc_id", "b.doc_id").distinct().count()

    val dfreq = posts.groupBy("sh").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("df"), col("sh"))
    val prefix = posts.join(dfreq, "sh")
      .select(col("doc_id"), col("sh"),
        row_number().over(w).as("pos"),
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id")).as("n"))
      .filter(col("pos") <= col("n") - ceil(col("n") * 0.8) + 1)
      .select("doc_id", "sh")
    val pfxCand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select("a.doc_id", "b.doc_id").distinct().count()
    spark.catalog.clearCache()

    assert(fullCand === 60L * 59 / 2,
      "footer must connect every pair in the full join")
    assert(pfxCand < fullCand / 10,
      s"prefix filter must collapse the boilerplate fanout, got $pfxCand of $fullCand")
    // and the survivors still verify to the SAME (empty) result set:
    // bodies are disjoint, so no pair reaches jaccard 0.8
    assert(pairsOf(PrefixFilterJoin.nearDuplicatePairs(docs, "doc_id", "text"))
      === pairsOf(NgramJaccard.nearDuplicatePairs(docs, "doc_id", "text")))
    spark.catalog.clearCache()
  }
}
