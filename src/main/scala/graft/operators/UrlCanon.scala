package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the normalization pass that runs BEFORE any
  * URL-keyed stage (exact URL dedup ahead of content dedup,
  * [[DomainCuration]] quotas, frontier dedup in a crawler): the same
  * resource arrives spelled a dozen ways (scheme/host case, default
  * ports, tracking params in arbitrary order, fragments) and every
  * spelling fragments the key space.
  *
  * Rules (the crawl-canonicalization standard set, RFC 3986 §6 plus
  * the tracking-param strip every pipeline adds):
  *   - scheme and host lowercased; userinfo dropped;
  *   - default ports stripped (http:80, https:443); explicit
  *     non-default ports kept;
  *   - empty path normalized to "/" (path case PRESERVED — paths are
  *     case-sensitive per RFC);
  *   - query: params split on '&'; empty params, `utm_*`, and the
  *     known click-id params ([[UrlCanon.TrackingParams]]) dropped;
  *     survivors SORTED (byte order) and re-joined — param order is
  *     almost never semantic, and sorting is what makes the canon a
  *     dedup key; '?' dropped when nothing survives;
  *   - fragment dropped (never sent to the server).
  *
  * Bracketed IP-literal hosts (RFC 3986 §3.2.2, `http://[::1]:8080/`)
  * parse with the colon inside the brackets NOT treated as the port
  * separator; the same case/port rules apply.
  *
  * A URL that does not parse (no scheme://host, or an unclosed
  * IP-literal bracket) passes through UNCHANGED — callers triage
  * those rows; silently rewriting them would corrupt non-URL ids
  * sharing the column.
  *
  * Scale shape: a pure per-row projection over Spark builtins
  * (regexp_extract / split / filter / array_sort / concat) — no UDF,
  * no shuffle, composes into any scan at full crawl parallelism. The
  * DuckDB oracle replays every rule, so the gate pins byte-exact
  * canon equality cross-engine.
  */
object UrlCanon {

  /** Exact-name tracking params stripped beside the `utm_*` prefix
    * family: the ad-platform click ids (Google, Facebook, Microsoft,
    * DoubleClick, Instagram, Mailchimp, Yandex, Twitter). A
    * deterministic snapshot — production swaps in its own list, the
    * expression shape is unchanged.
    */
  val TrackingParams: Seq[String] = Seq(
    "gclid", "fbclid", "msclkid", "dclid", "igshid",
    "mc_cid", "mc_eid", "yclid", "twclid")

  private val SchemeRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://"

  /** Host: a bracketed IP-literal (RFC 3986 §3.2.2 — the colon inside
    * `[::1]` is NOT a port separator) or a colon-terminated reg-name.
    * The bracketed alternative must come FIRST or `[^/?#:]+` stops at
    * the first ':' inside the brackets and the canon corrupts.
    */
  private val HostRe = "(\\[[^\\]/?#]*\\]|[^/?#:]+)"
  private val HostReNc = "(?:\\[[^\\]/?#]*\\]|[^/?#:]+)"

  /** The canonical form of `url` (see object doc for the rule set). */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url,
      "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val host = lower(regexp_extract(url,
      SchemeRe + "(?:[^/?#@]*@)?" + HostRe, 1))
    val port = regexp_extract(url,
      SchemeRe + "(?:[^/?#@]*@)?" + HostReNc + ":([0-9]+)", 1)
    val path = regexp_extract(url, SchemeRe + "[^/?#]*([^?#]*)", 1)
    // first '?' BEFORE any '#': a '?' inside the fragment is not a query
    val query = regexp_extract(url, "^[^#?]*\\?([^#]*)", 1)

    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val name = (p: Column) => substring_index(p, "=", 1)
    val params = filter(split(query, "&"), p =>
      p =!= "" && !name(p).startsWith("utm_") &&
        !name(p).isin(TrackingParams: _*))
    val q = array_join(array_sort(params), "&")

    val canon = concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      when(path === "", lit("/")).otherwise(path),
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
    // Passthrough: no scheme://host at all, OR a broken IP-literal
    // (an unclosed '[' falls through to the reg-name branch as a bare
    // '[' — rewriting it would corrupt the URL, the documented
    // unparseable-passes-through contract).
    when(host === "" ||
      (host.startsWith("[") && !host.endsWith("]")), url)
      .otherwise(canon)
  }
}
