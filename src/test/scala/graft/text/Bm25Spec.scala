package graft.text

import graft.SparkTestSession
import graft.queries.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Bm25Spec extends AnyFunSuite {

  private val spark = SparkTestSession.spark

  private lazy val docs =
    Tables.load(spark, "/root/testdata/sf0.001", "documents")

  test("results are partitioning-invariant (fixed-point score sums)") {
    def run(d: org.apache.spark.sql.DataFrame) =
      Bm25.topDocs(d, "doc_id", "text",
          Bm25.rankedQueryTerms(d, "doc_id", "text", 21, 8), 10)
        .orderBy("q_id", "rank").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSeq
    val a = run(docs)
    val b = run(docs.repartition(7))
    assert(a.nonEmpty)
    assert(a === b)
    spark.catalog.clearCache()
  }

  test("derived-query fused path == topDocs over rankedQueryTerms") {
    // topDocsDerivedQueries folds query ranking and df into the one
    // postings aggregate; the two-scan reference formulation must
    // produce the identical frame
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("q_id", "rank").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSeq
    val reference = rows(Bm25.topDocs(docs, "doc_id", "text",
      Bm25.rankedQueryTerms(docs, "doc_id", "text", 21, 8), 10))
    val fused = rows(Bm25.topDocsDerivedQueries(docs, "doc_id", "text",
      21, 8, 10))
    assert(reference.nonEmpty)
    assert(fused === reference)
    spark.catalog.clearCache()
  }

  test("single-term ranking matches driver-computed log-idf BM25") {
    // for a one-term query, rational idf is a constant factor, so the
    // engine's ranking must equal textbook (log-idf) BM25's exactly
    import spark.implicits._
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def toks(t: String): Seq[String] =
      t.toLowerCase.split(" ", -1).toSeq.filter(_.nonEmpty)
    val counts = scala.collection.mutable.Map.empty[String, Long]
    rows.foreach(r => toks(r._2).foreach(t =>
      counts(t) = counts.getOrElse(t, 0L) + 1))
    // need positive log idf (df well under n/2) or the textbook score
    // ORDER ITSELF inverts — take the first ranked term past the
    // stopword plateau that is rare enough
    val docFreq = scala.collection.mutable.Map.empty[String, Int]
    rows.foreach(r => toks(r._2).distinct.foreach(t =>
      docFreq(t) = docFreq.getOrElse(t, 0) + 1))
    val term = counts.toSeq.sortBy { case (t, n) => (-n, t) }
      .drop(20).map(_._1).find(t => docFreq(t) <= rows.length / 3).get

    val n = rows.length.toDouble
    val dl = rows.map { case (id, t) => id -> toks(t).length.toDouble }.toMap
    val avgdl = dl.values.sum / n
    val tf = rows.map { case (id, t) =>
      id -> toks(t).count(_ == term).toDouble
    }.filter(_._2 > 0)
    val dfT = tf.length.toDouble
    val (k1, b) = (1.2, 0.75)
    val expected = tf.map { case (id, f) =>
      val sat = f * (k1 + 1) / (f + k1 * (1 - b + b * dl(id) / avgdl))
      (id, math.log((n - dfT + 0.5) / (dfT + 0.5)) * sat)
    }.sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSeq

    val got = Bm25.topDocs(docs, "doc_id", "text",
        Seq((0L, term)).toDF("q_id", "term"), 10)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    assert(got === expected)
    spark.catalog.clearCache()
  }

  test("served index reproduces topDocs without touching the corpus") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("q_id", "rank").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSeq
    // materialize the query terms (a real workload's queries arrive as
    // data, not as corpus lineage — and the no-Generate assertion
    // below must see only the SERVING plan)
    import spark.implicits._
    val qt = Bm25.rankedQueryTerms(docs, "doc_id", "text", 21, 8)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      .toDF("q_id", "term")
    try {
      Bm25.writeIndex(docs, "doc_id", "text", "bm25_idx", numBuckets = 8)
      val served = Bm25.topDocsIndexed(spark, "bm25_idx", qt, 10)
      // no corpus scan, no tokenization: the served plan has no
      // generator (explode) anywhere — the query-term derivation is
      // the caller's own frame
      val plan = served.queryExecution.executedPlan.toString
      assert(!plan.contains("Generate"),
        s"served BM25 must not re-tokenize anything:\n$plan")
      assert(rows(served) ===
        rows(Bm25.topDocs(docs, "doc_id", "text", qt, 10)))
    } finally {
      Seq("postings", "df", "dl", "stats").foreach(s =>
        spark.sql(s"DROP TABLE IF EXISTS bm25_idx_$s"))
      spark.catalog.clearCache()
    }
  }

  test("append-then-serve == index-the-union (incremental maintenance)") {
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("q_id", "rank").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSeq
    val evens = docs.filter(col("doc_id") % 2 === 0)
    // plant one batch-only doc with a vocabulary-unique term so the
    // immediate-retrievability claim below cannot be vacuous
    val odds = docs.filter(col("doc_id") % 2 === 1)
      .unionByName(Seq((999999L, "zzzuniq zzzuniq word table", "en",
        "src0", 26L)).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val qt = Bm25.rankedQueryTerms(docs, "doc_id", "text", 21, 8)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      .toDF("q_id", "term")
    try {
      Bm25.writeIndex(evens, "doc_id", "text", "bm25_incr", numBuckets = 8)
      Bm25.appendToIndex(odds, "doc_id", "text", "bm25_incr",
        numBuckets = 8)
      Bm25.writeIndex(evens.unionByName(odds), "doc_id", "text",
        "bm25_full", numBuckets = 8)
      assert(rows(Bm25.topDocsIndexed(spark, "bm25_incr", qt, 10)) ===
        rows(Bm25.topDocsIndexed(spark, "bm25_full", qt, 10)))
      // stats folded exactly: integer counts identical, avgdl the same
      // single division
      val si = spark.table("bm25_incr_stats").collect().head
      val sf = spark.table("bm25_full_stats").collect().head
      assert(si.getLong(0) === sf.getLong(0))
      assert(si.getLong(1) === sf.getLong(1))
      assert(si.getDouble(2) === sf.getDouble(2))
      // the planted batch-only document is immediately retrievable,
      // and only batch docs carry its unique term
      val hits = Bm25.topDocsIndexed(spark, "bm25_incr",
        Seq((0L, "zzzuniq")).toDF("q_id", "term"), 10).collect()
      assert(hits.length === 1 && hits.head.getLong(2) === 999999L,
        "the appended doc must be served for its unique term")
    } finally {
      Seq("postings", "df", "dl", "stats").foreach { s =>
        spark.sql(s"DROP TABLE IF EXISTS bm25_incr_$s")
        spark.sql(s"DROP TABLE IF EXISTS bm25_full_$s")
      }
      spark.catalog.clearCache()
    }
  }
}
