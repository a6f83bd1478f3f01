package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT set-similarity self-join via prefix filtering — the
  * AllPairs/PPJoin candidate-generation principle (Bayardo et al.,
  * WWW 2007; Xiao et al., WWW 2008; distributed form: Vernica et al.,
  * SIGMOD 2010).
  *
  * [[NgramJaccard.nearDuplicatePairs]] is also exact, but its
  * postings self-join fans out Σ_sh df(sh)² candidate rows — every
  * co-occurring pair, counted once per shared shingle. Its
  * `maxShingleDocFreq` cap bounds that fanout only by DROPPING
  * ubiquitous shingles, a documented recall loss. Prefix filtering
  * keeps exactness AND bounds the fanout: order every document's
  * shingles by a global canonical order (ascending document
  * frequency, id tie-break — rarest first), and join only each
  * document's first `|A| - ceil(t·|A|) + 1` shingles. Any pair with
  * Jaccard ≥ t must share a token inside both prefixes (if all shared
  * tokens sat in A's suffix, the overlap would be at most
  * `ceil(t·|A|) - 1 < ceil(t·|A|) ≤ |A∩B|` — and if the FIRST shared
  * token in the global order sat in A's suffix, every later-ordered
  * shared token would too, so that first shared token is in A's
  * prefix and, symmetrically, in B's), so candidate generation is
  * complete — no
  * false negatives — while ubiquitous shingles sit at the END of the
  * order and rarely enter any prefix. At t = 0.8 a document joins on
  * ~20% of its shingles, and those are its rarest: the df² fanout
  * collapses toward the true-pair count.
  *
  * Verification is exact: candidates (distinct pairs) join each side's
  * full shingle SET (bounded per-document arrays, id-keyed hash
  * joins), and `array_intersect` sizes give the true Jaccard — so the
  * output equals `nearDuplicatePairs` row-for-row (spec'd, and the
  * oracle gate replays every stage).
  *
  * Shape at 100 TB: the df frame is shingle-keyed (the postings
  * aggregate the family already pays); the per-document rank window
  * partitions by doc_id (never global); the candidate self-join is
  * keyed on prefix shingles only; the verify joins are id-keyed with
  * candidate-proportional fanout. No stage is quadratic in anything
  * but the TRUE near-duplicate count.
  */
object PrefixFilterJoin {

  /** (doc_a, doc_b, jaccard) with doc_a < doc_b and jaccard ≥
    * `threshold` — exactly [[NgramJaccard.nearDuplicatePairs]]'s
    * contract, via prefix-filtered candidates.
    */
  def nearDuplicatePairs(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, threshold: Double = 0.8): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"prefix filtering needs 0 < t <= 1, got $threshold")
    // persisted: feeds the df aggregate, the rank window, and the two
    // verify sides — callers release via catalog.clearCache() like the
    // family's other multi-consumer postings frames
    val posts = NgramJaccard
      .hashedShingles(docs, idCol, textCol, shingleSize).persist()
    val dfreq = posts.groupBy("sh").agg(count(lit(1)).as("df"))
    // global canonical order = (df ASC, sh ASC): total (sh is unique
    // within a doc's distinct set), so every doc ranks consistently
    val byDoc = Window.partitionBy("doc_id").orderBy(col("df"), col("sh"))
    val ranked = posts.join(dfreq, "sh")
      .select(col("doc_id"), col("sh"),
        row_number().over(byDoc).as("pos"),
        count(lit(1)).over(Window.partitionBy("doc_id")).as("n"))
    // |A| - ceil(t|A|) + 1; t·n and ceil are integer-exact doubles for
    // any real document size, and the oracle mirrors the same two ops
    val prefix = ranked
      .filter(col("pos") <=
        col("n") - ceil(col("n").cast("double") * threshold) + 1)
      .select("doc_id", "sh")
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // exact verify: per-doc shingle sets as bounded arrays; intersect
    // size is order-independent, so collect_list's partition order
    // never reaches the result
    val sets = posts.groupBy("doc_id")
      .agg(collect_list(col("sh")).as("s"), count(lit(1)).as("n"))
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("s").as("sa"),
        col("n").as("na")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("s").as("sb"),
        col("n").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sa"), col("sb"))).cast("long").as("inter"),
        col("na"), col("nb"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
