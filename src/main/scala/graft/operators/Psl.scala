package graft.operators

/** The FULL publicsuffix.org data file, parsed into the rule classes
  * [[DomainCuration.registrableDomainPsl]] resolves (round 16 — the
  * curated snapshot's breadth gap closed; the resolution algebra was
  * already complete in round 15).
  *
  * Data: `src/main/resources/graft/public_suffix_list.dat` — the
  * public-domain-published Mozilla Public Suffix List (MPL-2.0, header
  * retained in the file; canonical upstream
  * `https://publicsuffix.org/list/public_suffix_list.dat`). REFRESH
  * PATH: replace that one resource file with a newer download — the
  * parser derives every rule class and depth from the data, so a new
  * depth class (say 6-label exacts) changes the generated expression
  * and the generated oracle SQL together, with no code edit.
  *
  * Parse rules (the PSL's own format):
  *   - comment (`//`) and blank lines drop; a rule is the first
  *     whitespace-delimited token of the line;
  *   - `!rule` = exception, `*.base` = wildcard, else exact;
  *   - ONE-LABEL exact rules are omitted: they duplicate the implicit
  *     `*` default (any unmatched TLD is a public suffix) and would
  *     only widen the compiled hash sets;
  *   - unicode rules additionally register their IDNA/punycode twin
  *     (`公司.cn` AND `xn--55qx5d.cn`) so both host spellings resolve;
  *   - ICANN and PRIVATE sections both load — registrable-domain
  *     grouping wants `foo.github.io` ≠ `bar.github.io`, which is
  *     precisely what the private section encodes.
  */
object Psl {

  /** Rules keyed by LABEL COUNT: `exact(k)` = k-label exact suffix
    * rules, `wild(b)` = b-label wildcard BASES (`*.base`, suffix
    * length b+1), `exc(d)` = d-label exception rules.
    */
  final case class Rules(exact: Map[Int, Seq[String]],
      wild: Map[Int, Seq[String]], exc: Map[Int, Seq[String]]) {
    /** Suffix lengths ≥ 2 any rule can produce, descending —
      * longest-match resolution order.
      */
    def suffixLengths: Seq[Int] =
      (exact.keys ++ wild.keys.map(_ + 1)).toSeq.distinct
        .filter(_ >= 2).sorted.reverse
  }

  lazy val rules: Rules = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null, "bundled public_suffix_list.dat missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try parse(src.getLines()) finally src.close()
  }

  private[graft] def parse(lines: Iterator[String]): Rules = {
    val raw = lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("//"))
      .map(_.takeWhile(!_.isWhitespace)).toSeq
    def forms(r: String): Seq[String] =
      if (r.forall(_ < 0x80)) Seq(r)
      else Seq(r,
        scala.util.Try(java.net.IDN.toASCII(r)).getOrElse(r)
          .toLowerCase).distinct
    def depthOf(r: String) = r.count(_ == '.') + 1
    def group(rs: Seq[String]): Map[Int, Seq[String]] =
      rs.flatMap(forms).distinct.groupBy(depthOf)
        .map { case (k, v) => k -> v.sorted }
    val (exc0, rest) = raw.partition(_.startsWith("!"))
    val (wild0, exact0) = rest.partition(_.startsWith("*."))
    Rules(
      group(exact0).filter(_._1 >= 2),
      group(wild0.map(_.stripPrefix("*."))),
      group(exc0.map(_.stripPrefix("!"))))
  }
}
