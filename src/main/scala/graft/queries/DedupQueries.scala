package graft.queries

import graft.dedup._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-verifiable dedup queries over the `documents` table.
  *
  * The testdata corpus has 25 planted near-duplicate pairs (a base doc
  * and a copy with one appended token); exact duplicates are planted
  * here by unioning a re-keyed 20% sample, mirrored in the oracle CTE.
  *
  * The oracle SQL is GENERATED (band/bit expressions unrolled) so DuckDB
  * reproduces every hash bit-for-bit: md5 is byte-exact in both engines,
  * hex→int uses digit arithmetic, and hex-string mins compare
  * identically (ASCII lexicographic).
  */
object DedupQueries {

  private val cfg = MinHashLSH.Config() // 3-shingles, 6 bands × 2 rows, t=0.8

  /** Shared oracle CTEs: tokenized docs + distinct 3-shingle sets +
    * exploded postings. Empty-comprehension semantics match the Spark
    * guard: generate_series(1, k) is empty for k<1 in DuckDB list
    * comprehensions.
    */
  private[queries] def shingleCtes(src: String = "documents"): String =
    s"""docs AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM $src),
       |sh AS (SELECT doc_id,
       |  list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
       |                 for i in generate_series(1, len(w)-2)]) AS s
       |  FROM docs),
       |shx AS (SELECT doc_id, unnest(s) AS sh FROM sh)""".stripMargin

  /** Full minhash near-dup CTE chain ending in `jac(doc_a, doc_b,
    * jaccard)`, over any source relation with (doc_id, text). With
    * `cap` set, mirrors `Config.maxShingleDocFreq`: shingles whose
    * document frequency exceeds the cap are removed from every
    * document's set BEFORE signatures and verification.
    */
  private[queries] def minhashJacCtes(src: String,
      cap: Option[Long] = None, c: MinHashLSH.Config = cfg): String = {
    val hashes = (0 until c.numHashes).map { i =>
      val (a, b) = MinHashLSH.coeffs(i)
      s"min((h0 * $a + $b) & ${MinHashLSH.Mask48}) AS h$i"
    }.mkString(", ")
    val bands = (0 until c.numBands).map { j =>
      val bv = (0 until c.rowsPerBand)
        .map(r => s"CAST(h${j * c.rowsPerBand + r} AS VARCHAR)")
        .mkString("||':'||")
      s"SELECT doc_id, $j AS band_id, md5($bv) AS band_val FROM mh"
    }.mkString("\n  UNION ALL ")
    val inter = "len(list_filter(sa.s, x -> list_contains(sb.s, x)))"
    val h0 = OracleDialect.hexPrefixToLong("md5(sh)", 12)
    val capCtes = cap.fold("") { c =>
      s""",
         |dfq AS (SELECT sh, count(*) AS df FROM shx GROUP BY sh),
         |shx_c AS (SELECT p.doc_id, p.sh FROM shx p
         |  JOIN dfq USING (sh) WHERE dfq.df <= $c),
         |sh_c AS (SELECT doc_id, list(sh) AS s FROM shx_c GROUP BY doc_id)"""
        .stripMargin
    }
    val (posts, sets) = if (cap.isDefined) ("shx_c", "sh_c") else ("shx", "sh")
    s"""${shingleCtes(src)}$capCtes,
       |hx0 AS (SELECT doc_id, CAST($h0 AS BIGINT) AS h0 FROM $posts),
       |mh AS (SELECT doc_id, $hashes FROM hx0 GROUP BY doc_id),
       |bands AS (
       |  $bands
       |),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band_id = b.band_id AND a.band_val = b.band_val
       |   AND a.doc_id < b.doc_id),
       |jac AS (SELECT c.doc_a, c.doc_b,
       |  CAST($inter AS DOUBLE) / (len(sa.s) + len(sb.s) - $inter) AS jaccard
       |  FROM cand c
       |  JOIN $sets sa ON sa.doc_id = c.doc_a
       |  JOIN $sets sb ON sb.doc_id = c.doc_b)""".stripMargin
  }

  // ---------------------------------------------------------------- exact

  /** Corpus with planted exact duplicates: every doc_id % 5 == 0 row
    * re-keyed (+100000) with identical text.
    */
  private def dupCorpus(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    docs.unionByName(
      docs.filter(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + 100000L))
  }

  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    ExactDedup.byTextHash(dupCorpus(spark, dir), "text", "doc_id")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")

  val dedupExactSql: String =
    """WITH corpus AS (
      |  SELECT doc_id, text, lang, source, n_chars FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, text, lang, source, n_chars
      |  FROM documents WHERE doc_id % 5 = 0
      |)
      |SELECT doc_id, lang, source, n_chars FROM (
      |  SELECT doc_id, lang, source, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |  FROM corpus)
      |WHERE rn = 1 ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- minhash

  def dedupMinhash(spark: SparkSession, dir: String): DataFrame =
    MinHashLSH.nearDuplicatePairs(
        Tables.loadSpread(spark, dir, "documents"), "doc_id", "text", cfg)
      .orderBy("doc_a", "doc_b")

  val dedupMinhashSql: String =
    s"""WITH ${minhashJacCtes("documents")}
       |SELECT doc_a, doc_b, jaccard FROM jac
       |WHERE jaccard >= ${cfg.threshold}
       |ORDER BY doc_a, doc_b""".stripMargin

  /** The boilerplate escape hatch, oracle-gated: cap = 2 keeps shingles
    * private to at most one pair of documents and drops anything shared
    * more widely. The result genuinely differs from the uncapped run
    * (22 vs 25 pairs at sf0.01 — the documented recall trade where a
    * pair's capped-set Jaccard falls under the threshold), and the
    * oracle recomputes the capped df-filter, signatures, bands and
    * capped-set Jaccard independently, so the hash-match proves the
    * whole capped pipeline bit-for-bit every round.
    */
  private val CapDf = 2L

  def dedupMinhashCapped(spark: SparkSession, dir: String): DataFrame =
    MinHashLSH.nearDuplicatePairs(
        Tables.loadSpread(spark, dir, "documents"), "doc_id", "text",
        MinHashLSH.Config(maxShingleDocFreq = Some(CapDf)))
      .orderBy("doc_a", "doc_b")

  val dedupMinhashCappedSql: String =
    s"""WITH ${minhashJacCtes("documents", cap = Some(CapDf))}
       |SELECT doc_a, doc_b, jaccard FROM jac
       |WHERE jaccard >= ${cfg.threshold}
       |ORDER BY doc_a, doc_b""".stripMargin

  /** The Sharp (16 bands × 4 rows) preset, oracle-gated: 64 affine
    * seed coefficients — including the dedup-on-collision draws above
    * index 11 that no other oracle query reaches — embedded as
    * literals in BOTH engines, so the hash-match verifies every seed's
    * multiplier/offset and the full 16×4 banding cross-engine.
    */
  def dedupMinhashSharp(spark: SparkSession, dir: String): DataFrame =
    MinHashLSH.nearDuplicatePairs(
        Tables.loadSpread(spark, dir, "documents"), "doc_id", "text",
        MinHashLSH.Sharp)
      .orderBy("doc_a", "doc_b")

  val dedupMinhashSharpSql: String =
    s"""WITH ${minhashJacCtes("documents", c = MinHashLSH.Sharp)}
       |SELECT doc_a, doc_b, jaccard FROM jac
       |WHERE jaccard >= ${MinHashLSH.Sharp.threshold}
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------- incremental

  /** Prefixed copy of the minhash signature/band CTE chain, so the
    * incremental oracle can run it over TWO relations (corpus + batch)
    * in one statement. Matches [[minhashJacCtes]]'s uncapped chain
    * step-for-step.
    */
  private def sigCtes(src: String, p: String,
      c: MinHashLSH.Config = cfg): String = {
    val hashes = (0 until c.numHashes).map { i =>
      val (a, b) = MinHashLSH.coeffs(i)
      s"min((h0 * $a + $b) & ${MinHashLSH.Mask48}) AS h$i"
    }.mkString(", ")
    val bands = (0 until c.numBands).map { j =>
      val bv = (0 until c.rowsPerBand)
        .map(r => s"CAST(h${j * c.rowsPerBand + r} AS VARCHAR)")
        .mkString("||':'||")
      s"SELECT doc_id, $j AS band_id, md5($bv) AS band_val FROM ${p}mh"
    }.mkString("\n  UNION ALL ")
    val h0 = OracleDialect.hexPrefixToLong("md5(sh)", 12)
    s"""${p}docs AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM $src),
       |${p}sh AS (SELECT doc_id,
       |  list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
       |                 for i in generate_series(1, len(w)-2)]) AS s
       |  FROM ${p}docs),
       |${p}shx AS (SELECT doc_id, unnest(s) AS sh FROM ${p}sh),
       |${p}hx0 AS (SELECT doc_id, CAST($h0 AS BIGINT) AS h0 FROM ${p}shx),
       |${p}mh AS (SELECT doc_id, $hashes FROM ${p}hx0 GROUP BY doc_id),
       |${p}bands AS (
       |  $bands
       |)""".stripMargin
  }

  /** One full incremental-dedup SCREEN as prefixed CTEs ending in
    * `${vp}keeps(doc_id, text)` — the batch docs neither exact- nor
    * near-duplicated in the corpus. [[sigCtes]] runs over both
    * relations under distinct prefixes, so several screens chain in
    * ONE statement: the sequential-replay oracle the feed-curation
    * gate needs (batch 2 screens against corpus ∪ keeps 1).
    */
  private[queries] def screenCtes(corpusRel: String, batchRel: String,
      cp: String, bp: String, vp: String): String = {
    val inter = "len(list_filter(sa.s, x -> list_contains(sb.s, x)))"
    s"""${sigCtes(corpusRel, cp)},
       |${sigCtes(batchRel, bp)},
       |${vp}cand AS (SELECT DISTINCT bb.doc_id AS b_id, cc.doc_id AS c_id
       |  FROM ${bp}bands bb JOIN ${cp}bands cc
       |    ON bb.band_id = cc.band_id AND bb.band_val = cc.band_val),
       |${vp}jac AS (SELECT cd.b_id,
       |    CAST($inter AS DOUBLE) / (len(sa.s) + len(sb.s) - $inter)
       |      AS jaccard
       |  FROM ${vp}cand cd
       |  JOIN ${bp}sh sa ON sa.doc_id = cd.b_id
       |  JOIN ${cp}sh sb ON sb.doc_id = cd.c_id),
       |${vp}near AS (SELECT DISTINCT b_id FROM ${vp}jac
       |  WHERE jaccard >= ${cfg.threshold}),
       |${vp}exact AS (SELECT DISTINCT bt.doc_id FROM $batchRel bt
       |  JOIN $corpusRel c ON md5(bt.text) = md5(c.text)),
       |${vp}keeps AS (SELECT bt.doc_id, bt.text FROM $batchRel bt
       |  LEFT JOIN ${vp}exact e ON e.doc_id = bt.doc_id
       |  LEFT JOIN ${vp}near n ON n.b_id = bt.doc_id
       |  WHERE e.doc_id IS NULL AND n.b_id IS NULL)""".stripMargin
  }

  /** Second ingest wave for the feed-curation gate, built so its
    * verdicts DEPEND on wave 1's keeps having entered the curated
    * corpus: exact and near copies of wave 1's reversed-text KEEPS
    * (rejected only under sequential screening), a fresh reversed
    * slice (keeps), and a near copy of the seed (rejected either way).
    */
  private[queries] def curateBatch2(docs: DataFrame): DataFrame = {
    val m = col("doc_id") % 7
    docs.filter(m === 2 || m === 3 || m === 4)
      .select(
        (col("doc_id") + when(m === 2, 500000L).when(m === 3, 600000L)
          .otherwise(700000L)).as("doc_id"),
        when(m === 2 || m === 3, reverse(col("text")))
          .otherwise(concat(col("text"), lit(" zzz"))).as("text"))
      .unionByName(docs.filter(m === 2).select(
        (col("doc_id") + 800000L).as("doc_id"),
        concat(reverse(col("text")), lit(" qqq")).as("text")))
  }

  /** The new-ingest batch screened against the standing corpus: a
    * re-keyed exact-copy slice (exact dups), an appended-token slice
    * (near dups — the planted-pair shape), and a reversed-text slice
    * (genuinely new). All three verdict classes are populated at every
    * SF (72/72/72 at sf0.001).
    */
  private[queries] def incrementalBatch(docs: DataFrame): DataFrame = {
    // one scan, not three union branches: the mod-7 classes are
    // disjoint, so a CASE projection over `doc_id % 7 <= 2` produces
    // the same multiset the three-way union did without re-reading
    // (and re-spreading) the documents parquet per branch
    val m = col("doc_id") % 7
    docs.filter(m <= 2)
      .select(
        (col("doc_id") + when(m === 0, 200000L)
          .when(m === 1, 300000L).otherwise(400000L)).as("doc_id"),
        when(m === 0, col("text"))
          .when(m === 1, concat(col("text"), lit(" zzz")))
          .otherwise(reverse(col("text"))).as("text"))
  }

  def dedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    IncrementalDedup.verdicts(docs, incrementalBatch(docs), "doc_id", "text")
      .orderBy("doc_id")
  }

  val dedupIncrementalSql: String = {
    val inter = "len(list_filter(sa.s, x -> list_contains(sb.s, x)))"
    s"""WITH batch AS (
       |  SELECT doc_id + 200000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
       |  UNION ALL SELECT doc_id + 300000, text || ' zzz' FROM documents WHERE doc_id % 7 = 1
       |  UNION ALL SELECT doc_id + 400000, reverse(text) FROM documents WHERE doc_id % 7 = 2
       |),
       |${sigCtes("documents", "c")},
       |${sigCtes("batch", "b")},
       |cand AS (SELECT DISTINCT bb.doc_id AS b_id, cc.doc_id AS c_id
       |  FROM bbands bb JOIN cbands cc
       |    ON bb.band_id = cc.band_id AND bb.band_val = cc.band_val),
       |jac AS (SELECT cd.b_id,
       |    CAST($inter AS DOUBLE) / (len(sa.s) + len(sb.s) - $inter) AS jaccard
       |  FROM cand cd
       |  JOIN bsh sa ON sa.doc_id = cd.b_id
       |  JOIN csh sb ON sb.doc_id = cd.c_id),
       |near AS (SELECT DISTINCT b_id FROM jac WHERE jaccard >= ${cfg.threshold}),
       |exact AS (SELECT DISTINCT bt.doc_id FROM batch bt
       |  JOIN documents c ON md5(bt.text) = md5(c.text))
       |SELECT bt.doc_id,
       |  CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END AS exact_dup,
       |  CASE WHEN n.b_id IS NOT NULL THEN 1 ELSE 0 END AS near_dup,
       |  CASE WHEN e.doc_id IS NULL AND n.b_id IS NULL THEN 1 ELSE 0 END AS keep
       |FROM batch bt
       |LEFT JOIN exact e ON e.doc_id = bt.doc_id
       |LEFT JOIN near n ON n.b_id = bt.doc_id
       |ORDER BY bt.doc_id""".stripMargin
  }

  /** Attributed incremental verdicts
    * ([[IncrementalDedup.verdictsAttributed]]): the same batch/corpus
    * screen, plus `dup_of` — the smallest corpus doc id that triggered
    * either screen ("rejected because of WHICH document"). The oracle
    * carries the candidate partner ids through the Jaccard CTE and
    * re-derives both min-partner aggregates independently.
    */
  def dedupAttributed(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    IncrementalDedup
      .verdictsAttributed(docs, incrementalBatch(docs), "doc_id", "text")
      .orderBy("doc_id")
  }

  val dedupAttributedSql: String = {
    val inter = "len(list_filter(sa.s, x -> list_contains(sb.s, x)))"
    s"""WITH batch AS (
       |  SELECT doc_id + 200000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
       |  UNION ALL SELECT doc_id + 300000, text || ' zzz' FROM documents WHERE doc_id % 7 = 1
       |  UNION ALL SELECT doc_id + 400000, reverse(text) FROM documents WHERE doc_id % 7 = 2
       |),
       |${sigCtes("documents", "c")},
       |${sigCtes("batch", "b")},
       |cand AS (SELECT DISTINCT bb.doc_id AS b_id, cc.doc_id AS c_id
       |  FROM bbands bb JOIN cbands cc
       |    ON bb.band_id = cc.band_id AND bb.band_val = cc.band_val),
       |jac AS (SELECT cd.b_id, cd.c_id,
       |    CAST($inter AS DOUBLE) / (len(sa.s) + len(sb.s) - $inter) AS jaccard
       |  FROM cand cd
       |  JOIN bsh sa ON sa.doc_id = cd.b_id
       |  JOIN csh sb ON sb.doc_id = cd.c_id),
       |nearo AS (SELECT b_id, min(c_id) AS near_of FROM jac
       |  WHERE jaccard >= ${cfg.threshold} GROUP BY b_id),
       |exacto AS (SELECT bt.doc_id, min(c.doc_id) AS exact_of FROM batch bt
       |  JOIN documents c ON md5(bt.text) = md5(c.text) GROUP BY bt.doc_id)
       |SELECT bt.doc_id,
       |  CASE WHEN e.exact_of IS NOT NULL THEN 1 ELSE 0 END AS exact_dup,
       |  CASE WHEN n.near_of IS NOT NULL THEN 1 ELSE 0 END AS near_dup,
       |  CASE WHEN e.exact_of IS NULL AND n.near_of IS NULL
       |       THEN 1 ELSE 0 END AS keep,
       |  least(e.exact_of, n.near_of) AS dup_of
       |FROM batch bt
       |LEFT JOIN exacto e ON e.doc_id = bt.doc_id
       |LEFT JOIN nearo n ON n.b_id = bt.doc_id
       |ORDER BY bt.doc_id""".stripMargin
  }

  // -------------------------------------------------------------- simhash

  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    SimHash.nearDuplicatePairs(
        SimHash.signatures(
          Tables.loadSpread(spark, dir, "documents"), "doc_id", "text"))
      .orderBy("doc_a", "doc_b")

  val dedupSimhashSql: String = {
    // first 8 hex digits of md5 → 32-bit int, via digit arithmetic
    val hv = OracleDialect.hexPrefixToLong("h", 8)
    val bitSums = (0 until SimHash.Bits)
      .map(k => s"SUM(CASE WHEN (hv >> $k) & 1 = 1 THEN 1 ELSE -1 END) AS s$k")
      .mkString(",\n    ")
    val sig = (0 until SimHash.Bits)
      .map(k => s"(CASE WHEN s$k > 0 THEN ${1L << k} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH ${shingleCtes()},
       |hx AS (SELECT doc_id, md5(sh) AS h FROM shx),
       |hv AS (SELECT doc_id, CAST($hv AS BIGINT) AS hv FROM hx),
       |bits AS (SELECT doc_id,
       |    $bitSums
       |  FROM hv GROUP BY doc_id),
       |sig AS (SELECT doc_id, CAST($sig AS BIGINT) AS simhash FROM bits),
       |bytes AS (SELECT doc_id, simhash, j AS byte_id,
       |    (simhash >> (8 * j)) & 255 AS byte_val
       |  FROM sig CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j)),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    bit_count(xor(a.simhash, b.simhash)) AS hamming
       |  FROM bytes a JOIN bytes b
       |    ON a.byte_id = b.byte_id AND a.byte_val = b.byte_val
       |   AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, hamming FROM cand
       |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin
  }

  // ---------------------------------------------------------------- ngram

  def dedupNgram(spark: SparkSession, dir: String): DataFrame =
    NgramJaccard.nearDuplicatePairs(
        Tables.loadSpread(spark, dir, "documents"), "doc_id", "text")
      .orderBy("doc_a", "doc_b")

  val dedupNgramSql: String =
    s"""WITH ${shingleCtes()},
       |hx AS (SELECT doc_id,
       |  CAST(${OracleDialect.hexPrefixToLong("md5(sh)", 15)} AS BIGINT)
       |    AS shh FROM shx),
       |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
       |  FROM hx a JOIN hx b ON a.shh = b.shh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |  CAST(i AS DOUBLE) / (na.n + nb.n - i) AS jaccard
       |FROM inter
       |JOIN sizes na ON na.doc_id = doc_a
       |JOIN sizes nb ON nb.doc_id = doc_b
       |WHERE CAST(i AS DOUBLE) / (na.n + nb.n - i) >= 0.8
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Prefix-filtered EXACT similarity self-join
    * ([[graft.dedup.PrefixFilterJoin]]): same contract and result set
    * as `dedup_ngram` (the equality is spec'd AND both gates hash the
    * same oracle-side row set), but candidates come only from each
    * document's rarest `|A| - ceil(0.8|A|) + 1` shingles under the
    * global (df ASC, sh ASC) order — complete by the prefix-filter
    * theorem, with fanout collapsing toward the true-pair count
    * instead of Σ df². Gate-only: runtime face is `dedup_ngram`'s
    * inverted-index self-join (this path strictly reduces it).
    */
  def dedupSsjoin(spark: SparkSession, dir: String): DataFrame =
    PrefixFilterJoin.nearDuplicatePairs(
        Tables.loadSpread(spark, dir, "documents"), "doc_id", "text")
      .orderBy("doc_a", "doc_b")

  val dedupSsjoinSql: String =
    s"""WITH ${shingleCtes()},
       |hx AS (SELECT doc_id,
       |  CAST(${OracleDialect.hexPrefixToLong("md5(sh)", 15)} AS BIGINT)
       |    AS shh FROM shx),
       |dfreq AS (SELECT shh, count(*) AS df FROM hx GROUP BY shh),
       |ranked AS (SELECT h.doc_id, h.shh,
       |    row_number() OVER (PARTITION BY h.doc_id
       |      ORDER BY d.df, h.shh) AS pos,
       |    count(*) OVER (PARTITION BY h.doc_id) AS n
       |  FROM hx h JOIN dfreq d ON d.shh = h.shh),
       |pfx AS (SELECT doc_id, shh FROM ranked
       |  WHERE pos <= n - ceil(CAST(n AS DOUBLE) * 0.8) + 1),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM pfx a JOIN pfx b ON a.shh = b.shh AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS n FROM hx GROUP BY doc_id),
       |inter AS (SELECT c.doc_a, c.doc_b, count(*) AS i
       |  FROM cand c
       |  JOIN hx a ON a.doc_id = c.doc_a
       |  JOIN hx b ON b.doc_id = c.doc_b AND b.shh = a.shh
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |  CAST(i AS DOUBLE) / (na.n + nb.n - i) AS jaccard
       |FROM inter
       |JOIN sizes na ON na.doc_id = doc_a
       |JOIN sizes nb ON nb.doc_id = doc_b
       |WHERE CAST(i AS DOUBLE) / (na.n + nb.n - i) >= 0.8
       |ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------------------------------- triplets

  private val TripletNegatives = 2
  private val TripletBuckets = 16

  /** Directed n-gram CONTAINMENT pairs
    * ([[graft.dedup.NgramJaccard.containmentPairs]]): c(A→B) =
    * |A∩B|/|A| ≥ 0.8 — the quotation/aggregator screen resemblance
    * misses. Gate-only: runtime face is `dedup_ngram`'s postings
    * self-join.
    */
  def dedupContainment(spark: SparkSession, dir: String): DataFrame =
    NgramJaccard.containmentPairs(
        Tables.loadSpread(spark, dir, "documents"), "doc_id", "text")
      .orderBy("doc_a", "doc_b")

  val dedupContainmentSql: String =
    s"""WITH ${shingleCtes()},
       |hx AS (SELECT doc_id,
       |  CAST(${OracleDialect.hexPrefixToLong("md5(sh)", 15)} AS BIGINT)
       |    AS shh FROM shx),
       |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
       |  FROM hx a JOIN hx b ON a.shh = b.shh AND a.doc_id <> b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, CAST(i AS DOUBLE) / na.n AS containment
       |FROM inter JOIN sizes na ON na.doc_id = doc_a
       |WHERE CAST(i AS DOUBLE) / na.n >= 0.8
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Contrastive (anchor, positive, negative) triplets over the ngram
    * near-dup pairs, negatives drawn by rendezvous hashing — the
    * oracle replays the pair join, the bucket draw, and the per-slot
    * arg-min pick digit for digit.
    */
  def trainTriplets(spark: SparkSession, dir: String): DataFrame =
    graft.text.TrainingPairs.contrastive(
        Tables.loadSpread(spark, dir, "documents"), "doc_id", "text",
        negatives = TripletNegatives, buckets = TripletBuckets)
      .orderBy("anchor", "positive", "slot")

  val trainTripletsSql: String = {
    def h15(e: String) =
      s"CAST(${OracleDialect.hexPrefixToLong(e, 15)} AS BIGINT)"
    s"""WITH ${shingleCtes()},
       |hx AS (SELECT doc_id, ${h15("md5(sh)")} AS shh FROM shx),
       |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
       |  FROM hx a JOIN hx b ON a.shh = b.shh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (SELECT doc_a, doc_b,
       |    CAST(i AS DOUBLE) / (na.n + nb.n - i) AS jaccard
       |  FROM inter
       |  JOIN sizes na ON na.doc_id = doc_a
       |  JOIN sizes nb ON nb.doc_id = doc_b
       |  WHERE CAST(i AS DOUBLE) / (na.n + nb.n - i) >= 0.8),
       |partners AS (SELECT doc_a AS anchor, doc_b AS neg FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |db AS (SELECT doc_id AS neg,
       |    ${h15("md5(CAST(doc_id AS VARCHAR))")} % $TripletBuckets AS bucket
       |  FROM documents),
       |sl AS (SELECT doc_a AS anchor, doc_b AS positive, jaccard, s AS slot,
       |    ${h15("md5(CAST(doc_a AS VARCHAR) || ':' || CAST(s AS VARCHAR))")}
       |      % $TripletBuckets AS bucket
       |  FROM pairs CROSS JOIN
       |    (SELECT unnest(generate_series(0, ${TripletNegatives - 1})) AS s)),
       |cand AS (SELECT sl.anchor, sl.positive, sl.slot, sl.jaccard, db.neg
       |  FROM sl JOIN db USING (bucket)
       |  WHERE db.neg != sl.anchor AND db.neg != sl.positive),
       |elig AS (SELECT c.* FROM cand c
       |  LEFT JOIN partners p ON p.anchor = c.anchor AND p.neg = c.neg
       |  WHERE p.neg IS NULL)
       |SELECT anchor, positive,
       |  arg_min(neg, md5(CAST(anchor AS VARCHAR) || ':' ||
       |    CAST(slot AS VARCHAR) || ':' || CAST(neg AS VARCHAR)))
       |    AS negative,
       |  CAST(slot AS BIGINT) AS slot, max(jaccard) AS jaccard
       |FROM elig GROUP BY anchor, positive, slot
       |ORDER BY anchor, positive, slot""".stripMargin
  }

  // ---------------------------------------------------------------- embed

  private val EmbedThreshold = 0.3

  /** Embedding-cosine near-dup pairs within hyperplane-LSH buckets —
    * the semantic complement to the token-based dedups. The synthetic
    * embeddings have no planted near-identical pairs (max cosine ≈
    * 0.5), so the threshold is set where pairs exist; the FUNCTION is
    * what the oracle pins down.
    */
  def dedupEmbed(spark: SparkSession, dir: String): DataFrame =
    EmbeddingNearDup.nearDuplicatePairs(
        Tables.loadSpread(spark, dir, "embeddings"), "vec_id", "embedding",
        EmbedThreshold, SimilarityQueries.lshCfg)
      .orderBy("vec_a", "vec_b")

  val dedupEmbedSql: String = {
    import OracleDialect.foldDot
    s"""WITH ${SimilarityQueries.planesCteSql},
       |v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |n AS (SELECT vec_id, v, ${foldDot("v", "v")} AS nrm FROM v),
       |b AS (SELECT vec_id, v, nrm,
       |    ${SimilarityQueries.bucketSql} AS bucket
       |  FROM n CROSS JOIN planes pl)
       |SELECT a.vec_id AS vec_a, d.vec_id AS vec_b,
       |  ${foldDot("a.v", "d.v")} / (sqrt(a.nrm) * sqrt(d.nrm)) AS cos_sim
       |FROM b a JOIN b d ON a.bucket = d.bucket AND a.vec_id < d.vec_id
       |WHERE ${foldDot("a.v", "d.v")} / (sqrt(a.nrm) * sqrt(d.nrm))
       |      >= $EmbedThreshold
       |ORDER BY vec_a, vec_b""".stripMargin
  }

  // ------------------------------------------------------- embed incremental

  /** Embedding-space face of the ingest screen: a batch of new vectors
    * (a re-keyed identical slice — guaranteed cos = 1 partners — and a
    * reversed-vector slice — direction scrambled) against the standing
    * embeddings corpus. Same bucket-join shape as [[dedupEmbed]], no
    * self-pair `<` constraint.
    */
  def dedupEmbedIncr(spark: SparkSession, dir: String): DataFrame = {
    val vecs = Tables.loadSpread(spark, dir, "embeddings")
    // one scan, not two union branches (same rationale as
    // incrementalBatch: disjoint mod classes → CASE projection)
    val m = col("vec_id") % 5
    val batch = vecs.filter(m <= 1)
      .select(
        (col("vec_id") + when(m === 0, 100000L).otherwise(200000L))
          .as("vec_id"),
        when(m === 0, col("embedding"))
          .otherwise(reverse(col("embedding"))).as("embedding"))
    EmbeddingNearDup.incrementalPairs(vecs, batch,
        "vec_id", "embedding", EmbedThreshold, SimilarityQueries.lshCfg)
      .orderBy("vec_new", "vec_old")
  }

  val dedupEmbedIncrSql: String = {
    import OracleDialect.foldDot
    val bucket = SimilarityQueries.bucketSql
    s"""WITH ${SimilarityQueries.planesCteSql},
       |batch AS (
       |  SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings
       |  WHERE vec_id % 5 = 0
       |  UNION ALL
       |  SELECT vec_id + 200000, list_reverse(embedding) FROM embeddings
       |  WHERE vec_id % 5 = 1
       |),
       |cv AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |cn AS (SELECT vec_id, v, ${foldDot("v", "v")} AS nrm FROM cv),
       |cb AS (SELECT n.vec_id, n.v, n.nrm, $bucket AS bucket
       |  FROM cn n CROSS JOIN planes pl),
       |bv AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM batch),
       |bn AS (SELECT vec_id, v, ${foldDot("v", "v")} AS nrm FROM bv),
       |bb AS (SELECT n.vec_id, n.v, n.nrm, $bucket AS bucket
       |  FROM bn n CROSS JOIN planes pl)
       |SELECT b.vec_id AS vec_new, c.vec_id AS vec_old,
       |  ${foldDot("b.v", "c.v")} / (sqrt(b.nrm) * sqrt(c.nrm)) AS cos_sim
       |FROM bb b JOIN cb c ON b.bucket = c.bucket
       |WHERE ${foldDot("b.v", "c.v")} / (sqrt(b.nrm) * sqrt(c.nrm))
       |      >= $EmbedThreshold
       |ORDER BY vec_new, vec_old""".stripMargin
  }

  // ------------------------------------------------------------- semantic

  /** SemDeDup-style pruning: IVF-cell-local cosine search, drop every
    * vector with a similar (≥ 0.3, see [[dedupEmbed]] threshold note)
    * lower-id neighbor in its cell. The oracle independently replays
    * the quantizer assignment (window argmax vs Spark's max_by — two
    * formulations of the same tie-broken argmax) and the in-cell
    * drop rule, so the hash pins both the clustering and the pruning.
    */
  def dedupSemantic(spark: SparkSession, dir: String): DataFrame =
    SemanticDedup.survivors(
        Tables.loadSpread(spark, dir, "embeddings"), "vec_id", "embedding",
        EmbedThreshold)
      .orderBy("vec_id")

  val dedupSemanticSql: String = {
    import OracleDialect.foldDot
    val stride = graft.similarity.IVFIndex.Config().centroidStride
    def cosSql(av: String, an: String, bv: String, bn: String): String =
      s"${foldDot(av, bv)} / (sqrt($an) * sqrt($bn))"
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |n AS (SELECT vec_id, v, ${foldDot("v", "v")} AS nrm FROM v),
       |c AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM n
       |  WHERE vec_id % $stride = 0),
       |asg AS (SELECT vid, v, nrm, cell FROM (
       |  SELECT n.vec_id AS vid, n.v, n.nrm, c.c_id AS cell,
       |    ROW_NUMBER() OVER (PARTITION BY n.vec_id
       |      ORDER BY ${cosSql("n.v", "n.nrm", "c.cv", "c.cn")} DESC, c.c_id)
       |      AS rn
       |  FROM n CROSS JOIN c) WHERE rn = 1),
       |dropped AS (SELECT DISTINCT a.vid FROM asg a JOIN asg b
       |  ON b.cell = a.cell AND b.vid < a.vid
       |  WHERE ${cosSql("a.v", "a.nrm", "b.v", "b.nrm")} >= $EmbedThreshold)
       |SELECT a.vid AS vec_id, a.cell FROM asg a
       |WHERE a.vid NOT IN (SELECT vid FROM dropped)
       |ORDER BY vec_id""".stripMargin
  }

  // ------------------------------------------------------------- clusters

  /** Transitive dedup clusters: connected components over the verified
    * minhash near-dup pairs. The oracle computes components
    * independently via a recursive reachability CTE — a structurally
    * different algorithm agreeing on the result.
    */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame =
    Clusters.connectedComponents(
        MinHashLSH.nearDuplicatePairs(
            Tables.loadSpread(spark, dir, "documents"), "doc_id", "text", cfg)
          .select(col("doc_a"), col("doc_b")),
        "doc_a", "doc_b")
      .orderBy("id")

  /** Incremental clusters ([[Clusters.appendComponents]]): standing
    * components from the doc_id % 5 != 0 slice's pairs, then the
    * batch's pairs (any pair touching a % 5 == 0 doc) folded in. Pair
    * candidacy is PAIRWISE under the default config (no doc-frequency
    * cap), so old∩old pairs are identical whether mined from the slice
    * or the full corpus — the fold's input is exactly a partition of
    * the full pair set, and the folded table must equal the full
    * recompute. The oracle is therefore `dedup_clusters`' recursive
    * closure over ALL pairs, verbatim: the hash match IS the
    * append ≡ rebuild proof at corpus scale (the ScalaCheck property
    * pins it on random graphs). Gate-only: runtime face is
    * dedup_clusters + dedup_incremental's screen.
    */
  def dedupClustersIncr(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val oldPairs = MinHashLSH.nearDuplicatePairs(
        docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text", cfg)
      .select(col("doc_a"), col("doc_b"))
    val standing = Clusters.connectedComponents(oldPairs, "doc_a", "doc_b")
    val batchPairs = MinHashLSH
      .nearDuplicatePairs(docs, "doc_id", "text", cfg)
      .filter(col("doc_a") % 5 === 0 || col("doc_b") % 5 === 0)
      .select(col("doc_a"), col("doc_b"))
    Clusters.appendComponents(standing, batchPairs, "doc_a", "doc_b")
      .orderBy("id")
  }

  val dedupClustersSql: String =
    s"""WITH RECURSIVE ${minhashJacCtes("documents")},
       |pairs AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= ${cfg.threshold}),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION SELECT doc_b, doc_a FROM pairs),
       |r(id, v) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT r.id, e.dst FROM r JOIN edges e ON e.src = r.v)
       |SELECT id, min(v) AS comp FROM r GROUP BY id ORDER BY id""".stripMargin

  /** Dedup-cluster audit frame: the size histogram of the near-dup
    * components plus the corpus totals a curation run reports
    * (clustered docs, would-be-removed docs) — the QA face of the
    * dedup family: a sudden mass of giant clusters means boilerplate
    * broke through the shingle caps; a histogram of pairs-only means
    * the threshold is too tight. One aggregate over the (already
    * gated) component frame. Gate-only: runtime face is
    * `dedup_clusters`.
    */
  def dedupClusterStats(spark: SparkSession, dir: String): DataFrame = {
    val comps = Clusters.connectedComponents(
      MinHashLSH.nearDuplicatePairs(
          Tables.loadSpread(spark, dir, "documents"), "doc_id", "text", cfg)
        .select(col("doc_a"), col("doc_b")),
      "doc_a", "doc_b")
    comps.groupBy("comp").agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("sz")).cast("bigint").as("n_docs"),
        (sum(col("sz")) - count(lit(1))).cast("bigint").as("n_removable"))
      .orderBy("cluster_size")
  }

  val dedupClusterStatsSql: String =
    s"""WITH RECURSIVE ${minhashJacCtes("documents")},
       |pairs AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= ${cfg.threshold}),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION SELECT doc_b, doc_a FROM pairs),
       |r(id, v) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT r.id, e.dst FROM r JOIN edges e ON e.src = r.v),
       |comps AS (SELECT id, min(v) AS comp FROM r GROUP BY id),
       |szs AS (SELECT comp, count(*) AS sz FROM comps GROUP BY comp)
       |SELECT sz AS cluster_size, count(*) AS n_clusters,
       |  CAST(sum(sz) AS BIGINT) AS n_docs,
       |  CAST(sum(sz) - count(*) AS BIGINT) AS n_removable
       |FROM szs GROUP BY sz ORDER BY cluster_size""".stripMargin

  // --------------------------------------------------- leakage-free split

  /** Leakage-free train/eval split
    * ([[graft.operators.Sampling.leakageFreeSplit]]): the md5 split
    * coordinate draws once per near-dup COMPONENT (verified minhash
    * pairs → connected components), so no near-duplicate pair can
    * straddle the split — the eval-contamination guard a per-document
    * split cannot provide. Gate-only: runtime face is the benched
    * minhash + clusters family plus a projection.
    */
  def sampleSplitSafe(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val comps = Clusters.connectedComponents(
      MinHashLSH.nearDuplicatePairs(docs, "doc_id", "text", cfg)
        .select(col("doc_a"), col("doc_b")),
      "doc_a", "doc_b")
    graft.operators.Sampling
      .leakageFreeSplit(docs, comps, "doc_id", evalFraction = 0.2)
      .orderBy("doc_id")
  }

  val sampleSplitSafeSql: String = {
    val coord = OracleDialect.hexPrefixToLong(
      "md5('split:'||CAST(gkey AS VARCHAR))", 8)
    s"""WITH RECURSIVE ${minhashJacCtes("documents")},
       |pairs AS (SELECT doc_a, doc_b FROM jac
       |  WHERE jaccard >= ${cfg.threshold}),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION SELECT doc_b, doc_a FROM pairs),
       |r(id, v) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT r.id, e.dst FROM r JOIN edges e ON e.src = r.v),
       |comp AS (SELECT id, min(v) AS comp FROM r GROUP BY id),
       |keyed AS (SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS gkey
       |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)
       |SELECT doc_id,
       |  CASE WHEN CAST($coord AS DOUBLE) / 4294967296 < 0.2
       |    THEN 'eval' ELSE 'train' END AS split
       |FROM keyed ORDER BY doc_id""".stripMargin
  }

  /** Dedup-aware k-fold assignment
    * ([[graft.operators.Sampling.leakageFreeFolds]], k = 5): the fold
    * draw happens once per near-dup component, so cross-validation
    * never trains on one member of a near-dup pair and validates on
    * the other. Fold = `(h·k) >> 32` over the group's md5 draw —
    * integer-exact. Gate-only: the `sample_split_safe` component
    * face with the fold arithmetic on top.
    */
  def sampleKfold(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val comps = Clusters.connectedComponents(
      MinHashLSH.nearDuplicatePairs(docs, "doc_id", "text", cfg)
        .select(col("doc_a"), col("doc_b")),
      "doc_a", "doc_b")
    graft.operators.Sampling
      .leakageFreeFolds(docs, comps, "doc_id", k = 5)
      .orderBy("doc_id")
  }

  val sampleKfoldSql: String = {
    val coord = OracleDialect.hexPrefixToLong(
      "md5('fold:'||CAST(gkey AS VARCHAR))", 8)
    s"""WITH RECURSIVE ${minhashJacCtes("documents")},
       |pairs AS (SELECT doc_a, doc_b FROM jac
       |  WHERE jaccard >= ${cfg.threshold}),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION SELECT doc_b, doc_a FROM pairs),
       |r(id, v) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT r.id, e.dst FROM r JOIN edges e ON e.src = r.v),
       |comp AS (SELECT id, min(v) AS comp FROM r GROUP BY id),
       |keyed AS (SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS gkey
       |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)
       |SELECT doc_id,
       |  (CAST($coord AS BIGINT) * 5) // 4294967296 AS fold
       |FROM keyed ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------- dedup weights

  /** Near-dup-aware sampling weights — the SOFT-dedup alternative to
    * dropping: every document stays, but each near-dup cluster's
    * members weigh `1/|cluster|` (ppm, integer div) so duplicated
    * content is not over-represented in a sampled mix. Composes the
    * `dedup_clusters` component face with one cluster-size census;
    * singletons weigh exactly 1e6. Gate-only: `dedup_clusters`' join
    * shapes + a broadcast |clusters|-row size join.
    */
  def sampleDedupWeight(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val comps = Clusters.connectedComponents(
      MinHashLSH.nearDuplicatePairs(docs, "doc_id", "text", cfg)
        .select(col("doc_a"), col("doc_b")),
      "doc_a", "doc_b")
    val keyed = docs.select(col("doc_id"))
      .join(comps.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("gkey"))
    val sizes = keyed.groupBy("gkey").agg(count(lit(1)).as("csize"))
    keyed.join(broadcast(sizes), Seq("gkey"))
      .select(col("doc_id"), col("gkey"), col("csize"),
        expr("1000000L div csize").as("weight_ppm"))
      .orderBy("doc_id")
  }

  val sampleDedupWeightSql: String =
    s"""WITH RECURSIVE ${minhashJacCtes("documents")},
       |pairs AS (SELECT doc_a, doc_b FROM jac
       |  WHERE jaccard >= ${cfg.threshold}),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION SELECT doc_b, doc_a FROM pairs),
       |r(id, v) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT r.id, e.dst FROM r JOIN edges e ON e.src = r.v),
       |comp AS (SELECT id, min(v) AS comp FROM r GROUP BY id),
       |keyed AS (SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS gkey
       |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
       |sz AS (SELECT gkey, count(*) AS csize FROM keyed GROUP BY gkey)
       |SELECT k.doc_id, k.gkey, CAST(s.csize AS BIGINT) AS csize,
       |  1000000 // CAST(s.csize AS BIGINT) AS weight_ppm
       |FROM keyed k JOIN sz s ON s.gkey = k.gkey
       |ORDER BY k.doc_id""".stripMargin

  // -------------------------------------------------------- blocking eval

  private val BlockSample = 500L

  /** Blocking-quality audit ([[graft.dedup.BlockingEval.eval]]):
    * reduction ratio on the full corpus, pairs completeness + pairs
    * quality on an exact-Jaccard labeled sample (doc_id < $BlockSample
    * — quadratic only in the sample, the labeled-subset convention).
    * Gate-only: the candidate stage is `dedup_minhash`'s benched band
    * join; the brute-force truth frame is sample-bounded.
    */
  def dedupBlockingEval(spark: SparkSession, dir: String): DataFrame =
    BlockingEval.eval(Tables.loadSpread(spark, dir, "documents"),
      "doc_id", "text", BlockSample, cfg)

  val dedupBlockingEvalSql: String = {
    val inter = "len(list_filter(sa.s, x -> list_contains(sb.s, x)))"
    s"""WITH ${minhashJacCtes("documents")},
       |tr AS (SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b
       |  FROM sh sa JOIN sh sb ON sa.doc_id < sb.doc_id
       |  WHERE sa.doc_id < $BlockSample AND sb.doc_id < $BlockSample
       |    AND (len(sa.s) + len(sb.s) - $inter) > 0
       |    AND CAST($inter AS DOUBLE) / (len(sa.s) + len(sb.s) - $inter)
       |        >= ${cfg.threshold}),
       |h AS (SELECT t.doc_a, t.doc_b FROM tr t
       |  JOIN cand c ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b),
       |agg AS (SELECT
       |  (SELECT count(*) FROM docs) AS n_docs,
       |  (SELECT count(*) FROM cand) AS n_cand,
       |  (SELECT count(*) FROM tr) AS n_truth,
       |  (SELECT count(*) FROM h) AS n_hit,
       |  (SELECT count(*) FROM cand
       |     WHERE doc_a < $BlockSample AND doc_b < $BlockSample)
       |    AS n_cand_s)
       |SELECT CAST(n_docs AS BIGINT) AS n_docs,
       |  CAST(n_cand AS BIGINT) AS n_cand,
       |  CAST(n_truth AS BIGINT) AS n_truth,
       |  CAST(n_hit AS BIGINT) AS n_hit,
       |  CAST(n_cand_s AS BIGINT) AS n_cand_s,
       |  CAST(1000000 - (CAST(n_cand AS HUGEINT) * 1000000) //
       |    ((CAST(n_docs AS HUGEINT) * (n_docs - 1)) // 2) AS BIGINT)
       |    AS rr_ppm,
       |  CASE WHEN n_truth > 0 THEN
       |    CAST((CAST(n_hit AS HUGEINT) * 1000000) // n_truth AS BIGINT)
       |    END AS pc_ppm,
       |  CASE WHEN n_cand_s > 0 THEN
       |    CAST((CAST(n_hit AS HUGEINT) * 1000000) // n_cand_s AS BIGINT)
       |    END AS pq_ppm
       |FROM agg""".stripMargin
  }

  // ------------------------------------------------------- canonical pick

  /** Canonical representative per near-dup cluster — the decision a
    * dedup pipeline actually ships: which member of each cluster
    * survives. Composes three proven operators (verified minhash
    * pairs → connected components → fixed-point PageRank authority
    * over the UNDIRECTED similarity graph) and picks each component's
    * highest-authority member (rank desc, id asc): the doc most
    * similar to the most others wins, not an arbitrary min-id. The
    * oracle replays all three stages independently (recursive
    * reachability + 5 generated PageRank rounds), so the gate checks
    * the COMPOSITION. Correctness-gated without a bench slot: its
    * runtime is the already-benched minhash + clusters family's.
    */
  def dedupCanonical(spark: SparkSession, dir: String): DataFrame = {
    val pairs = MinHashLSH.nearDuplicatePairs(
        Tables.loadSpread(spark, dir, "documents"), "doc_id", "text", cfg)
      .select(col("doc_a"), col("doc_b"))
    val comps = Clusters.connectedComponents(pairs, "doc_a", "doc_b")
    val edges = pairs
      .unionByName(pairs.select(col("doc_b").as("doc_a"),
        col("doc_a").as("doc_b")))
      .withColumn("w", lit(1L))
    val ranks = graft.operators.PageRank.ranks(edges, "doc_a", "doc_b", "w")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("comp"))
      .orderBy(col("rank_fp").desc, col("id"))
    comps.join(ranks, comps("id") === ranks("node"))
      .select(col("id"), col("comp"), col("rank_fp"))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("comp"))
      .agg(count(lit(1)).as("n_members"),
        max(when(col("rn") === 1, col("id"))).as("canonical_id"),
        max(when(col("rn") === 1, col("rank_fp"))).as("rank_fp"))
      .orderBy("comp")
  }

  val dedupCanonicalSql: String = {
    val S = graft.operators.PageRank.Scale
    val rounds = (1 to 5).map { k =>
      s"""pr$k AS (
         |  SELECT n.node,
         |    (3 * $S) // (20 * (SELECT cnt FROM nn))
         |      + (17 * coalesce(c.m, 0)) // 20 AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, sum(e.w * (p.r // o.outw)) AS m
         |    FROM e JOIN pr${k - 1} p ON p.node = e.src
         |    JOIN outw o ON o.src = e.src
         |    GROUP BY e.dst) c ON c.node = n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH RECURSIVE ${minhashJacCtes("documents")},
       |pairs AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= ${cfg.threshold}),
       |e AS (SELECT doc_a AS src, doc_b AS dst, 1 AS w FROM pairs
       |      UNION SELECT doc_b, doc_a, 1 FROM pairs),
       |cc(id, v) AS (
       |  SELECT src, src FROM e
       |  UNION
       |  SELECT cc.id, e.dst FROM cc JOIN e ON e.src = cc.v),
       |comp AS (SELECT id, min(v) AS comp FROM cc GROUP BY id),
       |nodes AS (SELECT DISTINCT src AS node FROM e),
       |nn AS (SELECT count(*) AS cnt FROM nodes),
       |outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM e
       |  GROUP BY src),
       |pr0 AS (SELECT node, $S // (SELECT cnt FROM nn) AS r FROM nodes),
       |$rounds,
       |ranked AS (
       |  SELECT c.comp, c.id, CAST(p.r AS BIGINT) AS rank_fp,
       |    row_number() OVER (PARTITION BY c.comp
       |      ORDER BY p.r DESC, c.id) AS rn
       |  FROM comp c JOIN pr5 p ON p.node = c.id)
       |SELECT comp, count(*) AS n_members,
       |  max(CASE WHEN rn = 1 THEN id END) AS canonical_id,
       |  max(CASE WHEN rn = 1 THEN rank_fp END) AS rank_fp
       |FROM ranked GROUP BY comp ORDER BY comp""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_canonical" -> (dedupCanonical(_, _)),
    "dedup_exact" -> (dedupExact(_, _)),
    "train_triplets" -> (trainTriplets(_, _)),
    "dedup_minhash" -> (dedupMinhash(_, _)),
    "dedup_minhash_capped" -> (dedupMinhashCapped(_, _)),
    "dedup_minhash_sharp" -> (dedupMinhashSharp(_, _)),
    "dedup_simhash" -> (dedupSimhash(_, _)),
    "dedup_ngram" -> (dedupNgram(_, _)),
    "dedup_ssjoin" -> (dedupSsjoin(_, _)),
    "dedup_containment" -> (dedupContainment(_, _)),
    "dedup_embed" -> (dedupEmbed(_, _)),
    "dedup_semantic" -> (dedupSemantic(_, _)),
    "dedup_clusters" -> (dedupClusters(_, _)),
    "dedup_clusters_incr" -> (dedupClustersIncr(_, _)),
    "dedup_cluster_stats" -> (dedupClusterStats(_, _)),
    "sample_split_safe" -> (sampleSplitSafe(_, _)),
    "sample_kfold" -> (sampleKfold(_, _)),
    "dedup_blocking_eval" -> (dedupBlockingEval(_, _)),
    "sample_dedup_weight" -> (sampleDedupWeight(_, _)),
    "dedup_incremental" -> (dedupIncremental(_, _)),
    "dedup_attributed" -> (dedupAttributed(_, _)),
    "dedup_embed_incr" -> (dedupEmbedIncr(_, _)))

  val oracleSql: Map[String, String] = Map(
    "dedup_canonical" -> dedupCanonicalSql,
    "dedup_exact" -> dedupExactSql,
    "train_triplets" -> trainTripletsSql,
    "dedup_minhash" -> dedupMinhashSql,
    "dedup_minhash_capped" -> dedupMinhashCappedSql,
    "dedup_minhash_sharp" -> dedupMinhashSharpSql,
    "dedup_simhash" -> dedupSimhashSql,
    "dedup_ngram" -> dedupNgramSql,
    "dedup_ssjoin" -> dedupSsjoinSql,
    "dedup_containment" -> dedupContainmentSql,
    "dedup_embed" -> dedupEmbedSql,
    "dedup_semantic" -> dedupSemanticSql,
    "dedup_clusters" -> dedupClustersSql,
    // shared verbatim: the folded standing table must equal the full
    // recompute, which is exactly what the closure oracle states
    "dedup_clusters_incr" -> dedupClustersSql,
    "dedup_cluster_stats" -> dedupClusterStatsSql,
    "sample_split_safe" -> sampleSplitSafeSql,
    "sample_kfold" -> sampleKfoldSql,
    "dedup_blocking_eval" -> dedupBlockingEvalSql,
    "sample_dedup_weight" -> sampleDedupWeightSql,
    "dedup_incremental" -> dedupIncrementalSql,
    "dedup_attributed" -> dedupAttributedSql,
    "dedup_embed_incr" -> dedupEmbedIncrSql)
}
