package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram language-model scoring — one order up from [[LmScore]]: a
  * document is scored by how surprising its CONSECUTIVE TOKEN PAIRS
  * are under a bigram model of a reference corpus. Token-salad spam
  * passes a unigram filter when its words are individually common;
  * its transitions give it away — the CCNet-style filter's next rung.
  *
  * Boundedness (the property that makes it scale): tokens map to the
  * top-`k` vocabulary or ONE shared OOV class, so the model is at most
  * (k+1)² bigram counts — a broadcastable one-row frame no matter the
  * corpus size, like [[LmScore.model]] and [[Vocab.encode]]. Scoring
  * is a pure per-row fold over the class stream: the corpus never
  * shuffles.
  *
  * Probabilities are add-one smoothed over the (k+2)-way next-class
  * space: P(c2|c1) = (c(c1,c2)+1) / (c(c1)+k+2), with c(c1) = 0 for a
  * first-class the model never saw. Score terms mirror [[LmScore]]:
  * `rarity_mean` folds single IEEE divisions (hash-gated exactly),
  * `nll_q` quantizes the mean negative log-likelihood to 1e-6.
  */
object BigramLm {

  /** The OOV class marker — outside the tokenizer's `[a-z0-9]`
    * alphabet, so it cannot collide with a real token.
    */
  val Oov = "\u0001"

  private def classStream(textCol: Column, vocabMap: Column): Column =
    transform(TokenCount.tokens(coalesce(textCol, lit(""))),
      t => when(element_at(vocabMap, t).isNotNull, t).otherwise(lit(Oov)))

  /** The fitted model as a ONE-ROW frame: `__v` (vocab membership
    * map), `__m12` ("c1 c2" → count), `__m1` (c1 → count-as-first),
    * `__kd` (the k+2 smoothing width as double).
    */
  def model(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 100): DataFrame = {
    val vocab = Vocab.topTokens(docs, idCol, textCol, k)
      .agg(map_from_entries(collect_list(struct(col("token"), lit(1L))))
        .as("__v"))
    val pairs = docs.crossJoin(broadcast(vocab))
      .select(classStream(col(textCol), col("__v")).as("cls"))
      .filter(size(col("cls")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(cls) - 1), i -> " +
          "struct(element_at(cls, i) AS c1, element_at(cls, i + 1) AS c2))"))
        .as("p"))
      .groupBy(col("p.c1").as("c1"), col("p.c2").as("c2"))
      .agg(count(lit(1)).as("cnt"))
    // bounded: <= (k+1)^2 rows collapse into two maps
    val m12 = pairs
      .agg(map_from_entries(collect_list(struct(
        concat(col("c1"), lit(" "), col("c2")), col("cnt")))).as("__m12"))
    val m1 = pairs.groupBy(col("c1")).agg(sum(col("cnt")).as("cnt1"))
      .agg(map_from_entries(collect_list(struct(col("c1"), col("cnt1"))))
        .as("__m1"))
    m12.crossJoin(m1).crossJoin(vocab)
      .select(col("__v"), col("__m12"), col("__m1"),
        lit((k + 2).toDouble).as("__kd"))
  }

  /** (doc_id, n_bigrams, n_unseen, rarity_mean, nll_q) per document
    * of `docs` against a fitted [[model]]; docs with < 2 tokens score
    * (0, 0, 0.0, 0). `n_unseen` counts pairs the model never observed
    * (count 0 — smoothing floor applied).
    */
  def scoreWith(docs: DataFrame, idCol: String, textCol: String,
      fitted: DataFrame): DataFrame = {
    val zero = struct(lit(0.0d).as("rar"), lit(0.0d).as("nll"),
      lit(0L).as("unseen"))
    docs.crossJoin(broadcast(fitted))
      .withColumn("__cls", classStream(col(textCol), col("__v")))
      .withColumn("__nb",
        greatest(size(col("__cls")) - 1, lit(0)).cast("bigint"))
      .withColumn("__acc",
        when(col("__nb") > 0,
          aggregate(sequence(lit(1), size(col("__cls")) - 1), zero,
            (acc, i) => {
              val c1 = element_at(col("__cls"), i)
              val c2 = element_at(col("__cls"), i + lit(1))
              val c12 = coalesce(
                element_at(col("__m12"), concat(c1, lit(" "), c2)), lit(0L))
              val c = (c12 + lit(1L)).cast("double")
              val dc1 = coalesce(element_at(col("__m1"), c1), lit(0L))
                .cast("double") + col("__kd")
              struct(
                (acc("rar") + dc1 / c).as("rar"),
                (acc("nll") - log(c / dc1)).as("nll"),
                (acc("unseen") + when(c12 === 0L, 1L).otherwise(0L))
                  .as("unseen"))
            }))
          .otherwise(zero))
      .select(
        col(idCol).as("doc_id"),
        col("__nb").as("n_bigrams"),
        col("__acc")("unseen").as("n_unseen"),
        when(col("__nb") > 0, col("__acc")("rar") / col("__nb"))
          .otherwise(0.0d).as("rarity_mean"),
        when(col("__nb") > 0,
            floor(col("__acc")("nll") / col("__nb") * 1e6d).cast("bigint"))
          .otherwise(0L).as("nll_q"))
  }
}
