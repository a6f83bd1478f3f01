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
  * map-side combined on word keys), capped at `maxVocab` rows by a
  * TakeOrderedAndProject top-k (per-task heap + driver merge — no
  * global sort). The merge rounds then run DRIVER-SIDE over that
  * bounded table (r16) — the ANN-codebook discipline: training state
  * that is O(vocab) by construction collects once and iterates in
  * memory, instead of paying a job launch plus an
  * analyze/optimize/codegen of an ever-deeper ApplyMerge plan chain
  * per round to sum a few hundred integers (measured: rounds were
  * ~60% driver gap at sf0.1). The loop reuses the Spark expressions'
  * own static scanners (WordShingles.scan / ApplyMerge.scan) and
  * UTF8String binary ordering, so it is bit-identical to the plan
  * form by construction, not by reimplementation.
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
    // (symbols never contain spaces, so boundaries stay unambiguous).
    // The seeded table is BOUNDED at maxVocab rows by construction, so
    // it collects once and the merge rounds run driver-side (r16) —
    // exactly the ANN-codebook discipline: the corpus pass (word
    // frequencies) is the distributed work; iterating Spark plans over
    // a ≤maxVocab-row cached table paid one job launch + one
    // analyze/optimize/codegen of an r-deep ApplyMerge chain PER ROUND
    // (O(rounds²) driver plan work) to sum a few hundred integers.
    // Bit-identity is by construction, not reimplementation: the loop
    // calls the SAME static scanners the Spark expressions evaluate —
    // WordShingles.scan for the adjacent-pair explode (including its
    // lowering and multiplicity semantics), ApplyMerge.scan for the
    // greedy merge — and orders candidates by UTF8String's binary
    // comparison, Spark's own string ordering. The DuckDB oracle
    // re-learns every round independently either way.
    import org.apache.spark.unsafe.types.UTF8String
    var seqs: Array[(UTF8String, Long)] = words
      .select(array_join(graft.expressions.CharShingles(col("word"), 1), " ")
        .as("seq"), col("cnt"))
      .collect()
      .map(r => (UTF8String.fromString(r.getString(0)), r.getLong(1)))

    val rules = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to numMerges) {
      val totals = scala.collection.mutable.HashMap.empty[UTF8String, Long]
      seqs.foreach { case (seq, cnt) =>
        val grams = graft.expressions.WordShingles
          .scan(seq, 2, distinct = false)
        var i = 0
        while (i < grams.numElements()) {
          val p = grams.getUTF8String(i)
          totals.update(p, totals.getOrElse(p, 0L) + cnt)
          i += 1
        }
      }
      require(totals.nonEmpty,
        s"corpus starved at merge round $r of $numMerges: no adjacent pairs left")
      var bestPair: UTF8String = null
      var bestTotal = 0L
      totals.foreach { case (p, t) =>
        if (bestPair == null || t > bestTotal ||
          (t == bestTotal && p.compareTo(bestPair) < 0)) {
          bestPair = p; bestTotal = t
        }
      }
      val pair = bestPair.toString
      val sp = pair.indexOf(' ')
      val (l, rt) = (pair.substring(0, sp), pair.substring(sp + 1))
      rules += ((r, l, rt, bestTotal))
      val lb = l.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val rb = rt.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      seqs = seqs.map { case (s, c) => (ApplyMerge.scan(s, lb, rb), c) }
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
