package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

/** [[DomainCuration]] contract: URL parsing edges, the datasheet
  * aggregate, blocklist screen, and quota determinism.
  */
class DomainCurationSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("host parsing: userinfo, port, path, case, and junk") {
    val rows = Seq(
      "https://www.Example.COM/a/b?q=1#f" -> "www.example.com",
      "http://user:pw@sub.host.org:8080/x" -> "sub.host.org",
      "ftp://files.example.net" -> "files.example.net",
      "https://single/" -> "single",
      "not a url" -> "",
      "" -> "")
    val got = rows.map(_._1).toDF("url")
      .select(DomainCuration.host(col("url")).as("h"))
      .collect().map(_.getString(0))
    assert(got.toSeq === rows.map(_._2))
  }

  test("registrable domain: last two labels, short hosts unchanged") {
    val rows = Seq(
      "www.example.com" -> "example.com",
      "a.b.c.d.example.org" -> "example.org",
      "example.com" -> "example.com",
      "localhost" -> "localhost",
      "" -> "")
    val got = rows.map(_._1).toDF("h")
      .select(DomainCuration.registrableDomain(col("h")).as("d"))
      .collect().map(_.getString(0))
    assert(got.toSeq === rows.map(_._2))
  }

  private val docs = Seq(
    // spam.example: 2 hosts, 3 docs, one exact-dup pair
    (1L, "https://a.spam.example/1", "buy now buy now buy now"),
    (2L, "https://b.spam.example/2", "buy now buy now buy now"),
    (3L, "https://a.spam.example/3", "unique spam pitch here today"),
    // good.example: 1 host, 2 docs, no dups
    (4L, "https://www.good.example/x", "a thoughtful essay on corpora"),
    (5L, "https://www.good.example/y", "another thoughtful essay entirely"))
    .toDF("doc_id", "url", "text")

  test("domainStats: docs, hosts, within-domain dup rows") {
    val s = DomainCuration.domainStats(docs, "url", "text")
      .orderBy("domain").collect()
    assert(s.map(_.getString(0)).toSeq === Seq("good.example", "spam.example"))
    val spam = s(1)
    assert(spam.getLong(1) === 3L) // n_docs
    assert(spam.getLong(2) === 2L) // n_hosts
    assert(spam.getLong(5) === 2L) // both rows of the dup pair count
    val good = s(0)
    assert(good.getLong(1) === 2L && good.getLong(2) === 1L &&
      good.getLong(5) === 0L)
  }

  test("screenBlocked drops exactly the blocklisted domain") {
    val kept = DomainCuration.screenBlocked(
        docs, "url", Seq("spam.example").toDF("domain"))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq === Seq(4L, 5L))
  }

  test("capPerDomain keeps at most cap per domain, deterministically") {
    val r1 = DomainCuration.capPerDomain(docs, "doc_id", "url", 2)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val r2 = DomainCuration.capPerDomain(
        docs.repartition(7), "doc_id", "url", 2)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(r1 === r2, "cap must be partitioning-invariant")
    val perDomain = DomainCuration.capPerDomain(docs, "doc_id", "url", 2)
      .groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perDomain.values.forall(_ <= 2L))
    assert(perDomain("good.example") === 2L)
    assert(perDomain("spam.example") === 2L)
  }
}
