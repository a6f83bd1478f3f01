package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[UrlCanon]] rule-by-rule edges and the PSL-backed registrable
  * domain's disagreement cases with the last-two-labels heuristic.
  */
class UrlCanonSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u").select(UrlCanon.canonicalize(col("u"))).collect()(0)
      .getString(0)

  test("scheme/host lowercase, userinfo dropped, fragment stripped") {
    assert(canon("HtTpS://User:Pw@WWW.Ex.COM/Path#frag") ===
      "https://www.ex.com/Path")
    // path case is PRESERVED (RFC: paths are case-sensitive)
    assert(canon("http://A.B/CaSe") === "http://a.b/CaSe")
  }

  test("default ports strip per scheme; explicit others survive") {
    assert(canon("http://h:80/x") === "http://h/x")
    assert(canon("https://h:443/x") === "https://h/x")
    assert(canon("https://h:80/x") === "https://h:80/x") // not its default
    assert(canon("http://h:8080/x") === "http://h:8080/x")
  }

  test("empty path becomes '/'") {
    assert(canon("http://h") === "http://h/")
    assert(canon("http://h?a=1") === "http://h/?a=1")
  }

  test("query: tracking stripped, params sorted, '?' dropped when empty") {
    assert(canon("http://h/p?utm_source=x&b=2&a=1&utm_campaign=y") ===
      "http://h/p?a=1&b=2")
    assert(canon("http://h/p?gclid=1&fbclid=2&utm_medium=m") ===
      "http://h/p")
    assert(canon("http://h/p?flag&b=2&&a=1") === "http://h/p?a=1&b=2&flag")
    // a '?' inside the fragment is NOT a query
    assert(canon("http://h/p#frag?fake=1") === "http://h/p")
  }

  test("non-URLs pass through unchanged") {
    assert(canon("not a url") === "not a url")
    assert(canon("doc-12345") === "doc-12345")
  }

  test("bracketed IPv6 hosts: colon inside [] is not a port separator") {
    // ADVICE r12: [^/?#:]+ stopped at the ':' in '[::1]' and rewrote
    // the URL to a corrupted 'http://[/x'.
    assert(canon("http://[::1]:8080/x") === "http://[::1]:8080/x")
    assert(canon("HTTP://[2001:DB8::1]:80/x") === "http://[2001:db8::1]/x")
    assert(canon("https://User@[2001:DB8::1]:8443/v6") ===
      "https://[2001:db8::1]:8443/v6")
    assert(canon("https://[::1]?b=2&utm_source=x&a=1") ===
      "https://[::1]/?a=1&b=2")
    // an unclosed bracket is unparseable → passthrough, not a rewrite
    assert(canon("http://[::1/broken") === "http://[::1/broken")
  }

  test("PSL registrable domain: suffix hosts group one label deeper") {
    val hosts = Seq("www.bbc.co.uk", "shop.x.co.uk", "a.b.s.com.au",
      "www.ex.com", "ex.com", "co.uk", "localhost", "deep.go.jp")
    val got = hosts.toDF("h")
      .select(DomainCuration.registrableDomainPsl(col("h")))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("bbc.co.uk", "x.co.uk", "s.com.au",
      "ex.com", "ex.com", "co.uk", "localhost", "deep.go.jp"))
    // ...where the heuristic would have collapsed the ccTLD families
    val heur = hosts.toDF("h")
      .select(DomainCuration.registrableDomain(col("h")))
      .collect().map(_.getString(0)).toSeq
    assert(heur.take(3) === Seq("co.uk", "co.uk", "com.au"))
  }

  test("full PSL algebra: wildcards, exceptions, three-label exacts, " +
      "longest-match precedence (round 15)") {
    def psl(hs: Seq[String]): Seq[String] =
      hs.toDF("h").select(DomainCuration.registrableDomainPsl(col("h")))
        .collect().map(_.getString(0)).toSeq
    // *.kawasaki.jp: every label under the base is a suffix
    assert(psl(Seq("a.docs.w1.kawasaki.jp")) === Seq("docs.w1.kawasaki.jp"))
    assert(psl(Seq("docs.w1.kawasaki.jp")) === Seq("docs.w1.kawasaki.jp"))
    // ...the degenerate: host IS the wildcard-derived suffix
    assert(psl(Seq("w1.kawasaki.jp")) === Seq("w1.kawasaki.jp"))
    // !city.kawasaki.jp beats the wildcard, at any depth
    assert(psl(Seq("www.city.kawasaki.jp", "city.kawasaki.jp",
      "a.b.city.kawasaki.jp")) ===
      Seq("city.kawasaki.jp", "city.kawasaki.jp", "city.kawasaki.jp"))
    // *.ck single-label base + !www.ck exception
    assert(psl(Seq("www.ex2.ck", "ex2.ck", "a.www.ck", "www.ck")) ===
      Seq("www.ex2.ck", "ex2.ck", "www.ck", "www.ck"))
    // three-label exact k12.ak.us wins over the 2-label ak.us entry
    // (longest match), which itself wins over the default
    assert(psl(Seq("x.s1.k12.ak.us", "s1.k12.ak.us", "foo.ak.us",
      "deep.foo.ak.us")) ===
      Seq("s1.k12.ak.us", "s1.k12.ak.us", "foo.ak.us", "foo.ak.us"))
  }

  test("FULL publicsuffix.org data file (round 16): private section, " +
      "4/5-label exacts, base-3 wildcards, punycode twins") {
    val r = graft.operators.Psl.rules
    // parse sanity: the real file's breadth, not a curated subset
    assert(r.exact.values.map(_.size).sum > 7000,
      s"full exact-rule breadth expected, got ${r.exact}")
    assert(r.exact.keySet === Set(2, 3, 4, 5))
    assert(r.wild.keySet === Set(1, 2, 3, 4))
    assert(r.exc.keySet === Set(2, 3))
    def psl(hs: Seq[String]): Seq[String] =
      hs.toDF("h").select(DomainCuration.registrableDomainPsl(col("h")))
        .collect().map(_.getString(0)).toSeq
    // PRIVATE section: github.io is a suffix — projects group apart
    assert(psl(Seq("a.p1.github.io", "p1.github.io", "github.io")) ===
      Seq("p1.github.io", "p1.github.io", "github.io"))
    // 4-label exact (the .us charter/private school registries)
    assert(psl(Seq("deep.h1.pvt.k12.ma.us", "h1.pvt.k12.ma.us")) ===
      Seq("h1.pvt.k12.ma.us", "h1.pvt.k12.ma.us"))
    // 5-label exact (regional object-store endpoints)
    assert(psl(Seq("b.s3.cn-north-1.amazonaws.com.cn")) ===
      Seq("b.s3.cn-north-1.amazonaws.com.cn"))
    // base-3 wildcard *.compute.amazonaws.com
    assert(psl(Seq("h.zone1.compute.amazonaws.com",
      "zone1.compute.amazonaws.com")) ===
      Seq("h.zone1.compute.amazonaws.com",
        "zone1.compute.amazonaws.com"))
    // ICANN entries the old curated subset lacked
    assert(psl(Seq("www.agency.gov.scot", "x.edu.krd",
      "site.aisai.aichi.jp")) ===
      Seq("agency.gov.scot", "x.edu.krd", "site.aisai.aichi.jp"))
    // unicode rules register their IDNA/punycode twin: 公司.cn
    assert(psl(Seq("foo.xn--55qx5d.cn", "foo.公司.cn")) ===
      Seq("foo.xn--55qx5d.cn", "foo.公司.cn"))
  }
}
