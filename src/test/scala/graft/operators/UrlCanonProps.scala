package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property invariants of [[UrlCanon.canonicalize]] over randomized
  * messy URLs (and non-URL garbage): the canonical form is IDEMPOTENT
  * — re-canonicalizing any output is a no-op, the defining property of
  * a canonicalization — and never null.
  */
object UrlCanonProps extends Properties("UrlCanon") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  private lazy val spark = SparkTestSession.spark

  private val genUrl: Gen[String] = {
    val scheme = Gen.oneOf("http", "HtTp", "HTTPS", "https", "ftp")
    val host = Gen.oneOf("Ex.COM", "www.Site7.example", "h",
      "[2001:DB8::1]", "[::1]", "[::1")   // incl. a broken bracket
    val user = Gen.oneOf("", "User@", "a:b@")
    val port = Gen.oneOf("", ":80", ":443", ":8080")
    val path = Gen.oneOf("", "/", "/P/x", "/CaSe/Y")
    val query = Gen.oneOf("", "?a=1", "?utm_source=x&b=2&a=1",
      "?gclid=9&z=3&&flag", "?b=2&a=1&utm_c=y")
    val frag = Gen.oneOf("", "#f", "#frag?fake=1")
    for {
      s <- scheme; u <- user; h <- host; p <- port
      pa <- path; q <- query; fr <- frag
      full <- Gen.oneOf(true, true, true, false)
      garbage <- Gen.oneOf("not a url", "doc-123", "a:b:c", "")
    } yield if (full) s"$s://$u$h$p$pa$q$fr" else garbage
  }

  property("canonicalize is idempotent and total") =
    forAll(Gen.listOfN(40, genUrl)) { urls =>
      import spark.implicits._
      val once = urls.toDF("u")
        .select(UrlCanon.canonicalize(col("u")).as("c"))
        .collect().map(_.getString(0)).toSeq
      val twice = once.toDF("u")
        .select(UrlCanon.canonicalize(col("u")).as("c"))
        .collect().map(_.getString(0)).toSeq
      once.forall(_ != null) && once == twice
    }
}
