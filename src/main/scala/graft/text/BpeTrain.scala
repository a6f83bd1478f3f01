package graft.text

import graft.expressions.ApplyMerge
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge-rule training — the tokenizer-TRAINING step
  * of an LLM data pipeline ([[Vocab]] builds word vocabularies;
  * [[Vocab.encodeFast]] applies one; this learns the subword merge
  * table that real tokenizers ship).
  *
  * Textbook word-internal BPE (Sennrich et al., ACL 2016): words carry
  * their corpus frequencies; every word starts as its character-symbol
  * sequence; each round counts adjacent symbol pairs weighted by word
  * frequency, picks the most frequent pair (ties: lexicographic pair
  * order — deterministic), and merges it greedily left-to-right in
  * every word.
  *
  * Scale shape — the textbook property that makes BPE trainable at
  * 100 TB: the corpus is touched ONCE (the word-frequency aggregate,
  * map-side combined on word keys); every training round then iterates
  * over the VOCABULARY-sized word table, capped at `maxVocab` rows by
  * a TakeOrderedAndProject top-k (per-task heap + driver merge — no
  * global sort). Rounds follow the k-means/PageRank iterative-literal
  * pattern: each winning pair is ONE collected row whose symbols embed
  * in the next round's plan as [[ApplyMerge]] literals (a pure
  * codegen'd projection — zero shuffle per round beyond the pair-count
  * aggregate over ≤ maxVocab rows). The word table is persisted once;
  * callers release it via `catalog.clearCache()` like the other
  * multi-action operators.
  *
  * Cross-engine determinism: pair totals are exact integer sums of
  * word counts; ordering is (total desc, pair asc); the greedy apply
  * is reproduced in the DuckDB oracle by a `list_reduce` whose string
  * accumulator merges a trailing `left` symbol when `right` arrives —
  * the oracle re-learns ALL rounds independently (chained CTEs, the
  * PageRank unrolling), so a hash match proves the entire
  * count→argmax→merge chain bit-reproducible.
  */
object BpeTrain {

  /** Learned merge table: (rnk, left, right, pair_count), rnk 1 =
    * first-learned merge. Throws if the corpus starves before
    * `numMerges` rounds (every word collapsed to one symbol) — a
    * training run that cannot fill its merge budget should fail
    * loudly, not return a silently short table.
    */
  def merges(docs: DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = 512): DataFrame = {
    val spark = docs.sparkSession
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    // ONE corpus pass: word frequencies over the standard tokenizer,
    // capped to the maxVocab most frequent words (ties: word asc) —
    // the training table is bounded no matter the corpus size.
    val words = docs
      .select(explode(TokenCount.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(maxVocab)
    // initial symbol sequence: the word's characters, space-joined
    // (symbols never contain spaces, so boundaries stay unambiguous)
    val seeded = words.select(col("word"), col("cnt"),
        array_join(graft.expressions.CharShingles(col("word"), 1), " ")
          .as("seq"))
      .persist()
    seeded.count() // materialize once; rounds re-scan the cached table

    var cur = seeded
    val rules = Seq.newBuilder[(Int, String, String, Long)]
    try {
      for (r <- 1 to numMerges) {
        val top = cur
          .select(explode(TextFeatures.textGrams(col("seq"), 2)).as("pair"),
            col("cnt"))
          .groupBy("pair").agg(sum(col("cnt")).as("total"))
          .orderBy(col("total").desc, col("pair").asc)
          .limit(1).collect()
        require(top.nonEmpty,
          s"corpus starved at merge round $r of $numMerges: no adjacent pairs left")
        val pair = top(0).getString(0)
        val total = top(0).getLong(1)
        val sp = pair.indexOf(' ')
        val (l, rt) = (pair.substring(0, sp), pair.substring(sp + 1))
        rules += ((r, l, rt, total))
        cur = cur.select(col("word"), col("cnt"),
          ApplyMerge(col("seq"), l, rt).as("seq"))
      }
    } finally {
      // the result frame below is built from driver-collected rules —
      // nothing downstream depends on the cache, so release it here
      // instead of leaking one cached table per call until a global
      // clearCache()
      seeded.unpersist(blocking = false)
    }
    import spark.implicits._
    rules.result().toDF("rnk", "left", "right", "pair_count")
      .select(col("rnk").cast("bigint"), col("left"), col("right"),
        col("pair_count"))
  }

  /** Serving face: segment every document's tokens with a learned merge
    * table — `numMerges` chained [[ApplyMerge]] scans, zero shuffle on
    * the corpus side (the merge table is plan literals, exactly like
    * the trained-codebook ANN serving paths).
    * Output: (id, segmented) where `segmented` joins each token's
    * symbol sequence with " | " between tokens.
    */
  def segment(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val toToken = (c: org.apache.spark.sql.Column) =>
      array_join(graft.expressions.CharShingles(c, 1), " ")
    val seq0 = docs.select(col(idCol).as("doc_id"),
      array_join(transform(TokenCount.tokens(coalesce(col(textCol), lit(""))),
        toToken), " | ").as("seq"))
    val fin = merges.foldLeft(seq0) { case (df, (l, r)) =>
      df.select(col("doc_id"), ApplyMerge(col("seq"), l, r).as("seq"))
    }
    fin.select(col("doc_id"), col("seq").as("segmented"))
  }
}
