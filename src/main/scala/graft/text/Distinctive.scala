package graft.text

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distinctive terms per group — weighted log-odds with an informative
  * Dirichlet prior (Monroe, Colaresi & Quinn, "Fightin' Words", 2008):
  * for each (group, token), how over-represented is the token in the
  * group versus the REST of the corpus, shrunk toward the corpus rate
  * so rare tokens don't dominate (the failure mode of raw rate ratios
  * and of tf-idf on short group samples). The standard corpus-
  * comparison tool: "what vocabulary makes this source / domain /
  * crawl slice different", which in a curation pipeline surfaces
  * source-specific boilerplate and topical skew before they bias a
  * training mix.
  *
  * Bounded-vocabulary discipline (the [[LmScore]] / [[Vocab]] design):
  * scores are computed over the top-`vocabK` corpus tokens only, so
  * every post-tokenize frame is ≤ groups × vocabK rows no matter how
  * large the corpus vocabulary grows. The corpus-scale stages are two
  * map-side-combinable aggregates (corpus token counts; per-group
  * counts of vocab tokens, pre-filtered through the broadcast vocab so
  * the shuffle carries only vocab keys). The log-odds arithmetic and
  * the per-group top-k window run on the bounded summary.
  *
  * Determinism: counts are exact integers; δ and z pass through libm
  * `ln` (engines may differ in the final ulp) so both ship
  * floor-quantized at 1e-6, the family convention. All divisions are
  * written as single IEEE ops in a pinned order.
  */
object Distinctive {

  /** (group, token, n_group, n_corpus, delta_q, z_q): the `topPerGroup`
    * tokens per group by z descending (token ascending on quantized
    * ties). `n_group` = token count within the group, `n_corpus` =
    * corpus-wide; `delta_q`/`z_q` = 1e-6-floor-quantized log-odds delta
    * and its z-score. `alpha0` is the total prior mass, spread over
    * tokens proportionally to corpus frequency.
    */
  def distinctiveTerms(docs: DataFrame, groupCol: String, textCol: String,
      vocabK: Int = 100, topPerGroup: Int = 10,
      alpha0: Double = 500.0): DataFrame = {
    require(vocabK > 0 && topPerGroup > 0 && alpha0 > 0)
    // corpus-scale: one tokenize feeding both aggregates — persisted
    // exactly like LmScore.model's staging table
    val toks = docs.select(col(groupCol).as("grp"),
        explode(TokenCount.tokens(coalesce(col(textCol), lit(""))))
          .as("token"))
      .persist()
    // vocab (k rows) and perGroup (groups × k) each feed multiple
    // consumers — persisted so the corpus-scale aggregates behind them
    // run once, not once per consumer
    val vocab = toks.groupBy("token").agg(count(lit(1)).as("yw"))
      .orderBy(col("yw").desc, col("token")).limit(vocabK)
      .persist()
    val perGroup = toks.join(broadcast(vocab.select("token")), "token")
      .groupBy("grp", "token").agg(count(lit(1)).as("ysw"))
      .persist()
    val groupTotals = perGroup.groupBy("grp").agg(sum("ysw").as("ns"))
    val corpusTotal = vocab.agg(sum("yw").as("n"))
    val scored = perGroup
      .join(broadcast(vocab), "token")
      .join(broadcast(groupTotals), "grp")
      .crossJoin(broadcast(corpusTotal))
      // Monroe et al. eq. 16/22, intermediates named so the oracle
      // replays the exact association order
      .withColumn("aw", lit(alpha0) * col("yw") / col("n"))
      .withColumn("a", col("ysw") + col("aw"))
      .withColumn("b", col("ns") + lit(alpha0) - col("ysw") - col("aw"))
      .withColumn("c", (col("yw") - col("ysw")) + col("aw"))
      .withColumn("d",
        (col("n") - col("ns")) + lit(alpha0) - (col("yw") - col("ysw"))
          - col("aw"))
      .withColumn("delta", log(col("a") / col("b")) - log(col("c") / col("d")))
      .withColumn("z",
        col("delta") / sqrt(lit(1.0d) / col("a") + lit(1.0d) / col("c")))
      .withColumn("delta_q", floor(col("delta") * 1e6d).cast("bigint"))
      .withColumn("z_q", floor(col("z") * 1e6d).cast("bigint"))
    // bounded-frame window: ≤ groups × vocabK rows
    val byZ = Window.partitionBy("grp").orderBy(col("z_q").desc, col("token"))
    scored.withColumn("rk", row_number().over(byZ))
      .filter(col("rk") <= topPerGroup)
      .select(col("grp").as(groupCol), col("token"),
        col("ysw").as("n_group"), col("yw").as("n_corpus"),
        col("delta_q"), col("z_q"))
  }
}
