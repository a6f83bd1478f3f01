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

  /** Deterministic public-suffix snapshot (round 14: the full-breadth
    * two-label cut, ~560 entries spanning the ccTLD registries of the
    * ICANN section plus the widely-used CentralNic-style commercial
    * entries; publicsuffix.org is the live upstream — production swaps
    * the data file in, the expression shape is unchanged). This Seq
    * holds the TWO-LABEL exact entries (plus the .us state registry);
    * the rarer rule classes live beside it — [[PslSnapshot3]]
    * (three-label exacts), [[PslWildcardBases]] (`*` wildcards),
    * [[PslExceptions]] (`!` exceptions) — and
    * [[registrableDomainPsl]] resolves all four with the PSL's own
    * longest-match precedence (round 15; the two-label-only fallback
    * this paragraph used to document is closed). Hosts whose tail
    * matches a suffix group one label DEEPER (bbc.co.uk, not co.uk).
    * Shared verbatim with the oracle SQL so both engines group with
    * literally the same snapshot.
    */
  val PslSnapshot: Seq[String] = Seq(
    // — gTLD-style second levels under ccTLDs, ICANN section —
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "sch.uk",
    "plc.uk", "ltd.uk", "nhs.uk", "police.uk", "mod.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "act.au", "nsw.au", "nt.au", "qld.au", "sa.au", "tas.au", "vic.au",
    "wa.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp",
    "gr.jp", "lg.jp",
    "co.kr", "or.kr", "ne.kr", "go.kr", "re.kr", "pe.kr", "ac.kr",
    "es.kr", "hs.kr", "kg.kr", "mil.kr", "ms.kr", "sc.kr",
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br",
    "art.br", "adv.br", "arq.br", "bio.br", "blog.br", "eco.br",
    "eng.br", "esp.br", "etc.br", "eti.br", "far.br", "flog.br",
    "fm.br", "fnd.br", "fot.br", "fst.br", "g12.br", "ggf.br",
    "imb.br", "ind.br", "inf.br", "jor.br", "jus.br", "lel.br",
    "mat.br", "med.br", "mus.br", "nom.br", "not.br", "ntr.br",
    "odo.br", "ppg.br", "pro.br", "psc.br", "psi.br", "qsl.br",
    "rec.br", "slg.br", "srv.br", "tmp.br", "trd.br", "tur.br",
    "tv.br", "vet.br", "vlog.br", "wiki.br", "zlg.br",
    "com.mx", "org.mx", "gob.mx", "edu.mx", "net.mx",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "mil.cn", "ah.cn", "bj.cn", "cq.cn", "fj.cn", "gd.cn", "gs.cn",
    "gx.cn", "gz.cn", "ha.cn", "hb.cn", "he.cn", "hi.cn", "hk.cn",
    "hl.cn", "hn.cn", "jl.cn", "js.cn", "jx.cn", "ln.cn", "mo.cn",
    "nm.cn", "nx.cn", "qh.cn", "sc.cn", "sd.cn", "sh.cn", "sn.cn",
    "sx.cn", "tj.cn", "tw.cn", "xj.cn", "xz.cn", "yn.cn", "zj.cn",
    "com.tw", "org.tw", "net.tw", "edu.tw", "gov.tw", "idv.tw",
    "game.tw", "ebiz.tw", "club.tw", "mil.tw",
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in",
    "ac.in", "edu.in", "gov.in", "mil.in", "nic.in", "res.in",
    "co.za", "org.za", "net.za", "gov.za", "ac.za", "web.za",
    "edu.za", "law.za", "mil.za", "nom.za", "school.za",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar", "gov.ar",
    "int.ar", "mil.ar", "tur.ar",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "av.tr",
    "bbs.tr", "bel.tr", "biz.tr", "dr.tr", "gen.tr", "info.tr",
    "k12.tr", "kep.tr", "mil.tr", "name.tr", "pol.tr", "tel.tr",
    "tv.tr", "web.tr",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "geek.nz",
    "gen.nz", "health.nz", "iwi.nz", "kiwi.nz", "maori.nz", "mil.nz",
    "parliament.nz", "school.nz", "cri.nz",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    "com.my", "net.my", "org.my", "gov.my", "edu.my", "mil.my",
    "name.my",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "co.id", "or.id", "web.id", "ac.id", "go.id", "biz.id", "desa.id",
    "mil.id", "my.id", "net.id", "ponpes.id", "sch.id",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph", "mil.ph",
    "ngo.ph", "i.ph",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "ac.vn",
    "biz.vn", "health.vn", "info.vn", "int.vn", "name.vn", "pro.vn",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "co.th", "or.th", "ac.th", "go.th", "in.th", "mi.th", "net.th",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl",
    "waw.pl", "wroc.pl", "krakow.pl", "poznan.pl", "gda.pl",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg", "sci.eg",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa",
    "pub.sa", "sch.sa",
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk", "biz.pk",
    "fam.pk", "gob.pk", "gok.pk", "gon.pk", "gop.pk", "gos.pk",
    "web.pk",
    "com.bd", "net.bd", "org.bd", "edu.bd", "gov.bd", "ac.bd",
    "mil.bd",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng", "i.ng",
    "mobi.ng", "name.ng", "sch.ng",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "info.ke", "me.ke",
    "mobi.ke", "sc.ke",
    "co.il", "org.il", "ac.il", "gov.il", "idf.il", "k12.il",
    "muni.il", "net.il",
    // — further ccTLD registries in the ICANN section —
    "co.at", "or.at", "ac.at", "gv.at", "priv.at",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "mil.co",
    "nom.co",
    "com.ec", "net.ec", "org.ec", "edu.ec", "fin.ec", "gob.ec",
    "gov.ec", "info.ec", "k12.ec", "med.ec", "mil.ec", "pro.ec",
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe", "mil.pe",
    "nom.pe",
    "com.ve", "net.ve", "org.ve", "co.ve", "e12.ve", "edu.ve",
    "gob.ve", "info.ve", "mil.ve", "web.ve",
    "com.uy", "net.uy", "org.uy", "edu.uy", "gub.uy", "mil.uy",
    "com.py", "net.py", "org.py", "coop.py", "edu.py", "gov.py",
    "mil.py", "una.py",
    "com.bo", "net.bo", "org.bo", "edu.bo", "gob.bo", "int.bo",
    "mil.bo", "tv.bo", "web.bo",
    "com.do", "net.do", "org.do", "art.do", "edu.do", "gob.do",
    "gov.do", "mil.do", "sld.do", "web.do",
    "com.gt", "net.gt", "org.gt", "edu.gt", "gob.gt", "ind.gt",
    "mil.gt",
    "com.sv", "edu.sv", "gob.sv", "org.sv", "red.sv",
    "com.ni", "net.ni", "org.ni", "ac.ni", "biz.ni", "co.ni",
    "edu.ni", "gob.ni", "in.ni", "info.ni", "int.ni", "mil.ni",
    "nom.ni", "web.ni",
    "com.pa", "net.pa", "org.pa", "abo.pa", "ac.pa", "edu.pa",
    "gob.pa", "ing.pa", "med.pa", "nom.pa", "sld.pa",
    "co.cr", "or.cr", "ac.cr", "ed.cr", "fi.cr", "go.cr", "sa.cr",
    "com.jm", "net.jm", "org.jm", "edu.jm", "gov.jm", "mil.jm",
    "com.pr", "net.pr", "org.pr", "biz.pr", "edu.pr", "gov.pr",
    "info.pr", "isla.pr", "name.pr", "pro.pr",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "com.pt", "net.pt", "org.pt", "edu.pt", "gov.pt", "int.pt",
    "nome.pt", "publ.pt",
    "com.gr", "net.gr", "org.gr", "edu.gr", "gov.gr",
    "com.ro", "nom.ro", "org.ro", "arts.ro", "firm.ro", "info.ro",
    "nt.ro", "rec.ro", "store.ro", "tm.ro", "www.ro",
    "co.rs", "org.rs", "ac.rs", "edu.rs", "gov.rs", "in.rs",
    "com.mk", "org.mk", "edu.mk", "gov.mk", "inf.mk", "name.mk",
    "net.mk",
    "com.mt", "net.mt", "org.mt", "edu.mt", "gov.mt",
    "com.cy", "net.cy", "org.cy", "ac.cy", "biz.cy", "ekloges.cy",
    "gov.cy", "ltd.cy", "mil.cy", "name.cy", "parliament.cy",
    "press.cy", "pro.cy", "tm.cy",
    "com.lb", "net.lb", "org.lb", "edu.lb", "gov.lb",
    "com.jo", "net.jo", "org.jo", "edu.jo", "gov.jo", "mil.jo",
    "name.jo", "sch.jo",
    "com.kw", "net.kw", "org.kw", "edu.kw", "emb.kw", "gov.kw",
    "ind.kw",
    "com.qa", "net.qa", "org.qa", "edu.qa", "gov.qa", "mil.qa",
    "name.qa", "sch.qa",
    "com.om", "net.om", "org.om", "co.om", "edu.om", "gov.om",
    "med.om", "museum.om", "pro.om",
    "com.bh", "net.bh", "org.bh", "edu.bh", "gov.bh",
    "com.ye", "net.ye", "org.ye", "edu.ye", "gov.ye", "mil.ye",
    "com.sy", "net.sy", "org.sy", "edu.sy", "gov.sy", "mil.sy",
    "com.lk", "net.lk", "org.lk", "ac.lk", "assn.lk", "edu.lk",
    "gov.lk", "grp.lk", "hotel.lk", "int.lk", "ltd.lk", "ngo.lk",
    "sch.lk", "soc.lk", "web.lk",
    "com.np", "net.np", "org.np", "edu.np", "gov.np", "mil.np",
    "com.kh", "net.kh", "org.kh", "edu.kh", "gov.kh", "mil.kh",
    "per.kh",
    "com.mm", "net.mm", "org.mm", "edu.mm", "gov.mm",
    "co.ma", "net.ma", "org.ma", "ac.ma", "gov.ma", "press.ma",
    "com.tn", "net.tn", "org.tn", "ens.tn", "fin.tn", "gov.tn",
    "ind.tn", "info.tn", "intl.tn", "nat.tn", "perso.tn", "rns.tn",
    "rnu.tn", "tourism.tn",
    "com.dz", "net.dz", "org.dz", "art.dz", "asso.dz", "edu.dz",
    "gov.dz", "pol.dz",
    "com.ly", "net.ly", "org.ly", "edu.ly", "gov.ly", "id.ly",
    "med.ly", "plc.ly", "sch.ly",
    "com.et", "net.et", "org.et", "biz.et", "edu.et", "gov.et",
    "info.et", "name.et",
    "co.tz", "or.tz", "ne.tz", "ac.tz", "go.tz", "hotel.tz",
    "info.tz", "me.tz", "mil.tz", "mobi.tz", "sc.tz", "tv.tz",
    "co.ug", "or.ug", "ne.ug", "ac.ug", "com.ug", "go.ug", "org.ug",
    "sc.ug",
    "co.zm", "org.zm", "ac.zm", "biz.zm", "com.zm", "edu.zm",
    "gov.zm", "info.zm", "mil.zm", "net.zm", "sch.zm",
    "co.zw", "org.zw", "ac.zw", "gov.zw", "mil.zw",
    "com.gh", "org.gh", "edu.gh", "gov.gh", "mil.gh",
    "co.ls", "org.ls", "ac.ls", "biz.ls", "gov.ls", "info.ls",
    "net.ls", "sc.ls",
    "co.mz", "org.mz", "ac.mz", "adv.mz", "edu.mz", "gov.mz",
    "net.mz",
    "co.bw", "org.bw",
    "com.na", "org.na", "co.na",
    "com.fj", "net.fj", "org.fj", "ac.fj", "biz.fj", "gov.fj",
    "info.fj", "mil.fj", "name.fj", "pro.fj",
    "com.pg", "net.pg", "org.pg", "ac.pg", "gov.pg", "mil.pg",
    "com.sb", "net.sb", "org.sb", "edu.sb", "gov.sb",
    "co.ck", "org.ck", "edu.ck", "gov.ck", "net.ck", "biz.ck",
    "gen.ck", "info.ck",
    "com.bn", "net.bn", "org.bn", "edu.bn", "gov.bn",
    "com.kz", "net.kz", "org.kz", "edu.kz", "gov.kz", "mil.kz",
    "com.uz", "net.uz", "org.uz", "co.uz",
    "com.ge", "net.ge", "org.ge", "edu.ge", "gov.ge", "mil.ge",
    "pvt.ge",
    "com.am", "net.am", "org.am", "co.am",
    "com.az", "net.az", "org.az", "biz.az", "co.az", "edu.az",
    "gov.az", "info.az", "int.az", "mil.az", "name.az", "pp.az",
    "pro.az",
    "com.by", "net.by", "gov.by", "mil.by", "of.by",
    "com.mo", "net.mo", "org.mo", "edu.mo", "gov.mo",
    "com.mv", "net.mv", "org.mv", "aero.mv", "biz.mv", "coop.mv",
    "edu.mv", "gov.mv", "info.mv", "int.mv", "mil.mv", "museum.mv",
    "name.mv", "pro.mv",
    "com.af", "net.af", "org.af", "edu.af", "gov.af",
    "com.iq", "net.iq", "org.iq", "edu.iq", "gov.iq", "mil.iq",
    "com.lr", "net.lr", "org.lr", "edu.lr", "gov.lr",
    "com.sl", "net.sl", "org.sl", "edu.sl", "gov.sl",
    "com.gn", "net.gn", "org.gn", "ac.gn", "gov.gn",
    "com.ml", "net.ml", "org.ml", "edu.ml", "gouv.ml", "gov.ml",
    "presse.ml",
    "com.sn", "org.sn", "art.sn", "edu.sn", "gouv.sn", "perso.sn",
    "univ.sn",
    "com.ci", "net.ci", "org.ci", "ac.ci", "co.ci", "ed.ci",
    "edu.ci", "go.ci", "int.ci", "or.ci",
    "com.cm", "net.cm", "co.cm", "gov.cm",
    "com.cu", "net.cu", "org.cu", "edu.cu", "gov.cu", "inf.cu",
    "com.ht", "net.ht", "org.ht", "art.ht", "asso.ht", "edu.ht",
    "firm.ht", "gouv.ht", "info.ht", "med.ht", "perso.ht", "pol.ht",
    "pro.ht", "rel.ht", "shop.ht",
    "com.bz", "net.bz", "org.bz", "edu.bz", "gov.bz",
    "com.gy", "net.gy", "co.gy", "edu.gy", "gov.gy", "org.gy",
    "com.sr", "net.sr", "org.sr", "edu.sr", "gov.sr",
    "com.tt", "net.tt", "org.tt", "biz.tt", "co.tt", "edu.tt",
    "gov.tt", "info.tt", "name.tt", "pro.tt",
    "com.bb", "net.bb", "org.bb", "biz.bb", "co.bb", "edu.bb",
    "gov.bb", "info.bb", "store.bb", "tv.bb",
    "com.lc", "net.lc", "org.lc", "co.lc", "edu.lc", "gov.lc",
    "com.vc", "net.vc", "org.vc", "edu.vc", "gov.vc", "mil.vc",
    "com.ag", "net.ag", "org.ag", "co.ag", "nom.ag",
    "com.dm", "net.dm", "org.dm", "co.dm", "edu.dm", "gov.dm",
    "com.kn", "net.kn", "org.kn", "edu.kn", "gov.kn",
    "com.gd", "net.gd", "org.gd", "co.gd", "edu.gd", "gov.gd",
    "com.bs", "net.bs", "org.bs", "edu.bs", "gov.bs",
    "com.ky", "net.ky", "org.ky", "edu.ky", "gov.ky",
    "com.vi", "net.vi", "org.vi", "co.vi", "k12.vi",
    "com.ai", "net.ai", "org.ai", "off.ai",
    "com.aw", "com.cw", "net.cw", "com.gp", "net.gp", "org.gp",
    "asso.gp", "edu.gp", "mobi.gp",
    "com.mu", "net.mu", "org.mu", "ac.mu", "co.mu", "gov.mu",
    "or.mu",
    "com.sc", "net.sc", "org.sc", "edu.sc", "gov.sc",
    "com.re", "asso.re", "nom.re",
    "com.mg", "org.mg", "co.mg", "edu.mg", "gov.mg", "mil.mg",
    "nom.mg", "prd.mg",
    "co.ao", "og.ao", "pb.ao", "it.ao", "ed.ao", "gv.ao",
    "com.cd", "net.cd", "org.cd",
    "com.gi", "ltd.gi", "edu.gi", "gov.gi", "mod.gi", "org.gi",
    "com.mw", "net.mw", "org.mw", "ac.mw", "biz.mw", "co.mw",
    "coop.mw", "edu.mw", "gov.mw", "int.mw",
    "com.rw", "net.rw", "org.rw", "ac.rw", "co.rw", "coop.rw",
    "gov.rw", "mil.rw",
    "com.bi", "org.bi", "co.bi", "edu.bi", "or.bi",
    "com.dj", "net.dj", "org.dj", "edu.dj",
    "com.er", "net.er", "org.er", "edu.er", "gov.er", "ind.er",
    "mil.er",
    "com.sd", "net.sd", "org.sd", "edu.sd", "gov.sd", "info.sd",
    "med.sd", "tv.sd",
    "com.ss", "net.ss", "org.ss", "biz.ss", "co.ss", "edu.ss",
    "gov.ss", "me.ss", "sch.ss",
    // — European ccTLDs with registry second levels —
    "co.hu", "org.hu", "info.hu", "priv.hu", "sport.hu", "tm.hu",
    "2000.hu", "agrar.hu", "bolt.hu", "casino.hu", "city.hu",
    "erotica.hu", "erotika.hu", "film.hu", "forum.hu", "games.hu",
    "hotel.hu", "ingatlan.hu", "jogasz.hu", "konyvelo.hu",
    "lakas.hu", "media.hu", "news.hu", "reklam.hu", "sex.hu",
    "shop.hu", "suli.hu", "szex.hu", "tozsde.hu", "utazas.hu",
    "video.hu",
    "co.im", "net.im", "org.im", "ac.im", "com.im", "tt.im", "tv.im",
    "co.je", "net.je", "org.je",
    "co.gg", "net.gg", "org.gg",
    "com.mc", "tm.mc", "asso.mc",
    "co.me", "net.me", "org.me", "ac.me", "edu.me", "gov.me",
    "its.me", "priv.me",
    "com.al", "net.al", "org.al", "edu.al", "gov.al", "mil.al",
    "com.ba", "net.ba", "org.ba", "edu.ba", "gov.ba", "mil.ba",
    "unbi.ba", "unsa.ba",
    "com.md", "org.md", "acad.md",
    "com.lv", "net.lv", "org.lv", "asn.lv", "conf.lv", "edu.lv",
    "gov.lv", "id.lv", "mil.lv",
    "com.ee", "org.ee", "edu.ee", "fie.ee", "gov.ee", "lib.ee",
    "med.ee", "pri.ee", "riik.ee",
    "com.lt", "org.lt", "gov.lt", "mil.lt",
    "com.bg", "org.bg", "0.bg", "1.bg", "a.bg", "b.bg", "edu.bg",
    "gov.bg",
    // — Russian Federation legacy second levels —
    "com.ru", "net.ru", "org.ru", "ac.ru", "edu.ru", "gov.ru",
    "int.ru", "mil.ru", "msk.ru", "spb.ru",
    // — popular commercial PSL entries widely treated as suffixes —
    "co.com", "us.com", "uk.com", "eu.com", "de.com", "gb.com",
    "br.com", "cn.com", "jp.com", "hu.com", "kr.com", "mex.com",
    "no.com", "qc.com", "ru.com", "sa.com", "se.com", "uy.com",
    "za.com", "africa.com", "gr.com", "in.net", "uk.net", "jp.net",
    "se.net", "za.net", "gb.net", "za.org", "ae.org", "us.org") ++
    UsStates.map(s => s"$s.us")

  /** US state codes — the .us locality registry backbone (2-label
    * `<state>.us` entries above, 3-label k12/cc/lib entries below).
    */
  private lazy val UsStates: Seq[String] = Seq(
    "ak", "al", "ar", "az", "ca", "co", "ct", "dc", "de", "fl", "ga",
    "hi", "ia", "id", "il", "in", "ks", "ky", "la", "ma", "md", "me",
    "mi", "mn", "mo", "ms", "mt", "nc", "nd", "ne", "nh", "nj", "nm",
    "nv", "ny", "oh", "ok", "or", "pa", "ri", "sc", "sd", "tn", "tx",
    "ut", "va", "vt", "wa", "wi", "wv", "wy")

  /** THREE-LABEL exact entries (round 15 — the deepest exact rules in
    * wide production use: the US locality registries; the PSL's own
    * k12/cc/lib blocks per state). Longest-match: a host ending in one
    * of these keeps FOUR labels.
    */
  val PslSnapshot3: Seq[String] =
    UsStates.flatMap(s => Seq(s"k12.$s.us", s"cc.$s.us", s"lib.$s.us"))

  /** Wildcard rule BASES — the PSL's `*.<base>` rules: EVERY single
    * label directly under the base is itself a public suffix (the
    * *.ck / *.bd class, and the Japanese city geographics). A host
    * with exactly base+1 labels IS a suffix (degenerate, returned as
    * itself); deeper hosts register one label past the wildcard.
    */
  val PslWildcardBases: Seq[String] = Seq(
    "bd", "ck", "er", "fk", "jm", "kh", "mm", "np", "pg",
    "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp",
    "sapporo.jp", "sendai.jp", "yokohama.jp")

  /** Exception rules — the PSL's `!<rule>` entries: the rule ITSELF is
    * a registrable domain carved out of its wildcard's shadow
    * (city.kawasaki.jp is Kawasaki City, not a private registration;
    * www.ck is the Cook Islands government). Exceptions beat every
    * other rule.
    */
  val PslExceptions: Seq[String] = Seq(
    "www.ck",
    "city.kawasaki.jp", "city.kitakyushu.jp", "city.kobe.jp",
    "city.nagoya.jp", "city.sapporo.jp", "city.sendai.jp",
    "city.yokohama.jp")

  /** PSL-backed registrable domain — round 15: the FULL rule algebra,
    * not just the two-label cut. Longest-match resolution in the
    * PSL's own precedence order:
    *
    *   1. an EXCEPTION rule matching the host's tail wins outright —
    *      the rule itself is the registrable domain (`!www.ck`,
    *      `!city.kawasaki.jp`);
    *   2. else the LONGEST matching suffix rule: three-label exact
    *      entries and base-2 wildcards (`*.kawasaki.jp` — suffix
    *      length 3) beat two-label exact entries and base-1 wildcards
    *      (`*.ck` — suffix length 2), which beat the implicit `*`
    *      default (the TLD itself);
    *   3. registrable = suffix + one label; a host that IS a suffix
    *      (bare `co.uk`, or `anything.ck` under `*.ck`) returns
    *      itself — the degenerate surfaced rather than nulled so
    *      groupings stay total.
    *
    * Still a pure per-row projection (each `isin` compiles to a
    * hash-set membership test; label tails come from `slice`, which
    * answers out-of-range with an empty array instead of erroring) —
    * the plan shape is [[registrableDomain]]'s exactly. The oracle SQL
    * mirrors this CASE chain verbatim over the same snapshot Seqs.
    */
  def registrableDomainPsl(h: Column): Column = {
    val sp = split(h, "\\.")
    val n = size(sp)
    def lastK(k: Int): Column = array_join(slice(sp, -k, k), ".")
    val (exc2, exc3) = PslExceptions.partition(_.count(_ == '.') == 1)
    val (wild1, wild2) = PslWildcardBases.partition(!_.contains("."))
    when(n >= 2 && lastK(2).isin(exc2: _*), lastK(2))
      .when(n >= 3 && lastK(3).isin(exc3: _*), lastK(3))
      .when(n >= 3 && (lastK(3).isin(PslSnapshot3: _*) ||
          lastK(2).isin(wild2: _*)),
        when(n === 3, h).otherwise(lastK(4)))
      .when(n >= 2 && (lastK(2).isin(PslSnapshot: _*) ||
          lastK(1).isin(wild1: _*)),
        when(n === 2, h).otherwise(lastK(3)))
      .otherwise(when(n <= 2, h).otherwise(lastK(2)))
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
