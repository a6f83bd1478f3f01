package graft.operators

import graft.text.{TextFeatures, TextStats}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain-level corpus curation — the host-keyed face of the
  * quota/stats machinery. Web corpora are governed per DOMAIN, not per
  * document: a handful of hosts contribute most of the crawl, spam and
  * SEO farms concentrate by registrable domain, and the standard
  * levers (blocklist, per-domain quota, per-domain quality read) all
  * key on the URL. This module provides the key extraction and the
  * three levers over any frame carrying a URL column.
  *
  * Scale shape:
  *   - host/domain extraction is a pure per-row projection (regex +
  *     label slice — no UDF, fully codegen'd);
  *   - [[domainStats]] is one persisted per-doc projection feeding
  *     three map-side-combined aggregates joined on the domain-count-
  *     bounded summary frames (the `pipeline_datasheet` shape, keyed
  *     by domain: ~10^7 domains on a full crawl — a fine shuffle key,
  *     and hot domains are exactly what the partial aggregates
  *     collapse);
  *   - [[screenBlocked]] is a broadcast LEFT ANTI join — real
  *     blocklists are megabytes, never corpus-scale;
  *   - [[capPerDomain]] delegates to [[Sampling.capPerStratum]]'s
  *     salted-coordinate window: the kept set is a pure function of
  *     (id, salt), so re-crawls keep the same representatives. A
  *     pathological mega-domain makes a hot window partition; the cap
  *     itself bounds what survives, and the two-level rank pattern
  *     (GroupedNtile) is the documented escape hatch if even ranking
  *     one domain's rows on one partition is too much.
  *
  * Registrable-domain note: [[registrableDomain]] is the last-two-
  * labels heuristic. Production curation uses the Public Suffix List
  * (co.uk, com.au, …) — a data file, not an algorithm change: swap the
  * suffix test, the plan shape is identical. The heuristic is what an
  * offline-deterministic oracle can replay.
  *
  * Reference scope note: the reference library has no URL surface —
  * engine extension (SURVEY §2.10), the VERDICT r10 gap #2.
  */
object DomainCuration {

  /** Authority host of a URL, lowercased: strips scheme, userinfo,
    * port, path/query/fragment. Empty string when the URL does not
    * parse (no scheme) — callers group those under '' and triage.
    */
  def host(url: Column): Column =
    lower(regexp_extract(url,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)", 1))

  /** Last-two-labels registrable domain (see the PSL note above). */
  def registrableDomain(h: Column): Column = {
    val sp = split(h, "\\.")
    when(size(sp) <= 2, h)
      .otherwise(concat(element_at(sp, -2), lit("."), element_at(sp, -1)))
  }

  /** PSL-backed registrable domain over the FULL publicsuffix.org
    * data file ([[Psl.rules]] — round 16 closes the curated-subset
    * breadth gap; the resolution algebra landed in round 15).
    * Longest-match resolution in the PSL's own precedence order:
    *
    *   1. an EXCEPTION rule matching the host's tail wins outright —
    *      the rule itself is the registrable domain (`!www.ck`,
    *      `!city.kawasaki.jp`), deeper exceptions first;
    *   2. else the LONGEST matching suffix rule, for every suffix
    *      length the DATA contains (5-label exacts like the regional
    *      object-store entries down to 2-label registries; a base-b
    *      wildcard contributes suffix length b+1) — beats the implicit
    *      `*` default (the TLD itself);
    *   3. registrable = suffix + one label; a host that IS a suffix
    *      (bare `co.uk`, or `anything.ck` under `*.ck`) returns
    *      itself — the degenerate surfaced rather than nulled so
    *      groupings stay total.
    *
    * Still a pure per-row projection: each `isin` compiles to ONE
    * hash-set membership test however many thousands of rules the
    * class holds (Catalyst `InSet`), label tails come from `slice`
    * (out-of-range answers empty, never errors), and the chain length
    * tracks the number of DISTINCT rule depths (7 for today's file),
    * not the rule count. The oracle SQL is GENERATED from the same
    * parsed rules ([[graft.queries.PipelineQueries]]), so both engines
    * group with literally one data file.
    */
  def registrableDomainPsl(h: Column): Column = {
    val r = Psl.rules
    val sp = split(h, "\\.")
    val n = size(sp)
    def lastK(k: Int): Column = array_join(slice(sp, -k, k), ".")
    val default = when(n <= 2, h).otherwise(lastK(2))
    val excCases = r.exc.toSeq.sortBy(-_._1).map { case (d, es) =>
      (n >= d && lastK(d).isin(es: _*), lastK(d))
    }
    val suffixCases = r.suffixLengths.map { k =>
      val tests =
        r.exact.get(k).map(es => lastK(k).isin(es: _*)).toSeq ++
          r.wild.get(k - 1).map(ws => lastK(k - 1).isin(ws: _*))
      (n >= k && tests.reduce(_ || _),
        when(n === k, h).otherwise(lastK(k + 1)))
    }
    (excCases ++ suffixCases).foldRight(default) {
      case ((c, v), acc) => when(c, v).otherwise(acc)
    }
  }

  def domainOf(url: Column): Column = registrableDomain(host(url))

  def domainOfPsl(url: Column): Column = registrableDomainPsl(host(url))

  /** Per-domain curation datasheet: one row per registrable domain —
    * (domain, n_docs, n_hosts, n_tokens, q_sum_fp, n_dup_rows).
    * `q_sum_fp` is the Σ floor(quality·2^20) fixed-point quality mass
    * (mean = q_sum_fp / n_docs / 2^20, division left to the reader so
    * the gate stays integer-exact); `n_dup_rows` counts rows whose
    * text md5 repeats WITHIN the domain — the per-domain dup rate's
    * numerator, and the first spam-farm tell.
    */
  def domainStats(docs: DataFrame, urlCol: String, textCol: String,
      psl: Boolean = false): DataFrame = {
    val w = TextFeatures.words(col(textCol))
    val dom = if (psl) domainOfPsl(col(urlCol)) else domainOf(col(urlCol))
    val perDoc = docs.select(
        dom.as("domain"),
        host(col(urlCol)).as("host"),
        size(w).cast("long").as("n_toks"),
        floor(TextStats.qualityScore(w) * lit((1L << 20).toDouble))
          .cast("long").as("q_fp"),
        md5(col(textCol)).as("h"))
      .persist()
    val base = perDoc.groupBy("domain").agg(
      count(lit(1)).as("n_docs"),
      sum("n_toks").as("n_tokens"),
      sum("q_fp").as("q_sum_fp"))
    val hosts = perDoc.groupBy(col("domain"), col("host"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy("domain").agg(count(lit(1)).as("n_hosts"))
    val dups = perDoc.groupBy(col("domain"), col("h"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy("domain")
      .agg(sum(when(col("cnt") > 1, col("cnt")).otherwise(0L))
        .as("n_dup_rows"))
    base.join(hosts, "domain").join(dups, "domain")
      .select(col("domain"), col("n_docs"), col("n_hosts"),
        col("n_tokens"), col("q_sum_fp"), col("n_dup_rows"))
  }

  /** Drop every document whose registrable domain is on the blocklist
    * — broadcast LEFT ANTI, the corpus never shuffles.
    */
  def screenBlocked(docs: DataFrame, urlCol: String,
      blocked: DataFrame): DataFrame = {
    val b = broadcast(blocked.select(col(blocked.columns.head).as("__bd")))
    docs.join(b, domainOf(col(urlCol)) === col("__bd"), "left_anti")
  }

  /** Keep at most `cap` documents per registrable domain, selected by
    * the deterministic salted coordinate ([[Sampling.capPerStratum]])
    * so the survivors are stable across runs and engines.
    */
  def capPerDomain(docs: DataFrame, idCol: String, urlCol: String,
      cap: Int, salt: String = "domain-quota"): DataFrame =
    Sampling.capPerStratum(
        docs.withColumn("domain", domainOf(col(urlCol))),
        idCol, "domain", cap, salt)
}
