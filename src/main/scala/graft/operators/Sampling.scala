package graft.operators

import graft.text.TextFeatures.hash32
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling — the training-data "mixing" /
  * downsampling primitive.
  *
  * `rand()`-based sampling is wrong for pipelines: results change per
  * run, per retry, and per engine, and a task retry double-samples or
  * drops rows. Here membership is a pure function of the row's id:
  * md5(salt:id) mapped to [0,1) and compared to the rate. Same rows
  * selected on every run, every engine (the DuckDB oracle reproduces
  * the exact row set), and any subset of the data can be sampled
  * independently — no coordination, no shuffle, filter pushed to the
  * scan. Changing `salt` draws an independent sample.
  *
  * Nested sampling is monotone per salt: rate 0.1 ⊂ rate 0.2 (the
  * standard property used to grow/shrink training mixes consistently).
  */
object Sampling {

  private val Bucket = 1L << 32

  /** [0, 1) sampling coordinate of an id column under `salt`. */
  def coordinate(id: Column, salt: String): Column =
    hash32(concat(lit(s"$salt:"), id.cast("string"))).cast("double") / Bucket

  /** Keep rows whose coordinate falls below `rate`. */
  def sample(df: DataFrame, idCol: String, rate: Double,
      salt: String = "s"): DataFrame =
    df.filter(coordinate(col(idCol), salt) < rate)

  /** Deterministic train/eval split tag: every row labeled "eval" with
    * probability `evalFraction`, "train" otherwise — a pure function of
    * the id, so the split is identical on every run/engine and a
    * document can never leak between sides. Use a dedicated salt per
    * experiment.
    */
  def splitColumn(id: Column, evalFraction: Double,
      salt: String = "split"): Column =
    when(coordinate(id, salt) < evalFraction, lit("eval")).otherwise(lit("train"))

  /** Dedup-aware train/eval split — the eval-contamination guard: a
    * near-duplicate of a training document sitting in the eval set
    * silently inflates every metric, and a per-document split CANNOT
    * prevent it (the two docs draw independently). Here the split
    * coordinate draws once per GROUP: `comps` is an (id, comp)
    * components frame over verified near-dup pairs (any
    * [[graft.dedup.Clusters.connectedComponents]] output); clustered
    * docs inherit their component's draw, singletons draw on their own
    * id — so no near-dup pair can ever straddle the split, while
    * singleton assignment stays exactly [[splitColumn]].
    *
    * Scale shape: one left equi-join of the corpus ids against the
    * components frame (bounded by the clustered-doc count — at real
    * dup rates far smaller than the corpus, and broadcast when small);
    * the split itself is a pure projection.
    */
  def leakageFreeSplit(docs: DataFrame, comps: DataFrame, idCol: String,
      evalFraction: Double, salt: String = "split"): DataFrame =
    docs.select(col(idCol))
      .join(comps.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        splitColumn(coalesce(col("comp"), col(idCol)), evalFraction, salt)
          .as("split"))

  /** Fold index ∈ [0, k) from the md5 draw: `(h·k) >> 32` over the
    * 32-bit hash — integer arithmetic (h·k < 2^35 for practical k), so
    * the assignment is engine-exact and fold sizes differ only by
    * hash granularity.
    */
  def foldColumn(id: Column, k: Int, salt: String = "fold"): Column =
    shiftright(
      hash32(concat(lit(s"$salt:"), id.cast("string"))) * lit(k.toLong), 32)

  /** Dedup-aware k-FOLD assignment — the cross-validation face of
    * [[leakageFreeSplit]]: the fold draw happens once per near-dup
    * COMPONENT, so no near-duplicate pair ever lands in different
    * folds (train-on-fold-A / validate-on-fold-B contamination), while
    * singletons draw on their own id. Same join shape and salt
    * discipline as the split.
    */
  def leakageFreeFolds(docs: DataFrame, comps: DataFrame, idCol: String,
      k: Int, salt: String = "fold"): DataFrame = {
    require(k >= 2 && k <= 1024, s"fold count in [2,1024], got $k")
    docs.select(col(idCol))
      .join(comps.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        foldColumn(coalesce(col("comp"), col(idCol)), k, salt).as("fold"))
  }

  /** Keep at most `cap` rows per stratum — the domain/source quota of a
    * training mix (no single crawl domain may dominate). Which rows
    * survive is deterministic: rank by the md5 coordinate (a fixed
    * "random" draw), tie-broken by id. The rank≤cap filter compiles to
    * partial+final WindowGroupLimit (each map task keeps only `cap`
    * rows per stratum BEFORE the shuffle), so a hot stratum ships
    * O(tasks × cap) rows, not its full population.
    */
  def capPerStratum(df: DataFrame, idCol: String, strataCol: String,
      cap: Int, salt: String = "quota"): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(coordinate(col(idCol), salt), col(idCol))
    df.withColumn("__qrk", row_number().over(w))
      .filter(col("__qrk") <= cap)
      .drop("__qrk")
  }

  /** Per-stratum rates (e.g. per-source mixing weights); strata not in
    * `rates` keep `defaultRate`.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      salt: String = "s"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (other, (k, r)) =>
      when(col(strataCol) === k, lit(r)).otherwise(other)
    }
    df.filter(coordinate(col(idCol), salt) < rate)
  }

  /** Temperature-weighted mix sampling with DATA-DERIVED rates — the
    * standard multilingual/multi-source rebalancing: stratum s with n_s
    * rows gets target share ∝ n_s^(1/T), so T = 1 keeps natural
    * proportions and larger T flattens the mix toward uniform (small
    * sources upsampled relative to their size — here capped at rate 1,
    * no duplication). `targetFrac` sets the overall kept fraction.
    *
    * Rates derive from the data in one pass: per-stratum counts, a
    * 1-row weight-total frame CROSS-JOINED (broadcast) onto the counts,
    * then the per-stratum rate joins back onto the rows (tiny side,
    * broadcast). The weight total folds in SORTED stratum order —
    * float addition is not associative, and an unordered aggregate
    * would make the rates (and so the kept ROW SET) nondeterministic
    * across partitionings/engines.
    *
    * T = 2 uses `sqrt` explicitly: IEEE sqrt is correctly rounded in
    * every engine, while `pow(x, 0.5)` is not guaranteed bit-equal to
    * it — so the oracle-verifiable configuration stays bit-exact. Other
    * temperatures go through `pow` (deterministic per engine, not
    * proven so across engines).
    */
  /** Epoch-weighted mix materialization — the upsampling complement of
    * [[temperatureSample]]'s capped-at-1 rates: stratum s is replicated
    * `epochs(s)` times (training mixes routinely give small high-quality
    * sources > 1 epoch). Integer part = exact replication; fractional
    * part resolves per row from the md5 coordinate, so 1.5 epochs means
    * every row once plus a DETERMINISTIC half of rows twice — the same
    * half on every run, engine, and retry. Output rows gain an
    * `epoch_copy` index (0-based) keeping replicas distinguishable —
    * downstream shard assignment should salt with it so copies of a
    * document land in different shards/batches.
    *
    * Scale shape: a broadcast-free per-row projection + generator —
    * replicas are produced WHERE THE DATA LIVES (no shuffle, no join;
    * the epoch map is a literal CASE). Rows with 0 copies (epochs < 1
    * acts as sampling) are filtered before the generator runs.
    */
  def epochMix(df: DataFrame, idCol: String, strataCol: String,
      epochs: Map[String, Double], defaultEpochs: Double = 1.0,
      salt: String = "epoch"): DataFrame = {
    require((epochs.values ++ Seq(defaultEpochs)).forall(_ >= 0.0),
      "epochs must be non-negative")
    val e = epochs.foldLeft(lit(defaultEpochs)) { case (other, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(other)
    }
    val n = floor(e).cast("bigint") +
      when(coordinate(col(idCol), salt) < e - floor(e), 1L).otherwise(0L)
    df.withColumn("__ncopies", n)
      .filter(col("__ncopies") > 0)
      .select(df.columns.map(col) :+
        explode(sequence(lit(0L), col("__ncopies") - 1)).as("epoch_copy"): _*)
  }

  /** Per-ROW weighted sampling — soft quality filtering: each row's
    * acceptance probability is its own weight column raised to an
    * integer `power` (power 1 = linear, 2+ sharpens toward the
    * high-quality end — the Llama-3-style alternative to a hard
    * quality cutoff, which keeps a calibrated tail of mid-quality
    * text instead of a cliff at the threshold).
    *
    * `power` is an INT and the exponent is applied by repeated IEEE
    * multiplication (not libm `pow`), so the acceptance threshold is
    * bit-identical in any engine — the same exactness discipline as
    * [[coordinate]]. Weights must lie in [0, 1]: 0 never keeps, 1
    * always keeps. Pure projection + filter, pushed to the scan.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      power: Int = 1, salt: String = "wq"): DataFrame = {
    require(power >= 1, s"power must be at least 1, got $power")
    val w = col(weightCol).cast("double")
    val threshold = (2 to power).foldLeft(w)((acc, _) => acc * w)
    df.filter(coordinate(col(idCol), salt) < threshold)
  }

  /** EXACT-SIZE weighted sample without replacement per stratum
    * (Efraimidis–Spirakis A-ES): each row draws the deterministic
    * uniform `u = (md5_32(salt:id) + 0.5) / 2^32` (never 0 or 1) and
    * races with key `ln(u) / w` — the k LARGEST keys per stratum win,
    * which selects each row with probability ∝ its weight. The "give
    * me exactly k docs per source, quality-weighted" primitive that
    * Bernoulli rates ([[weightedSample]]) can't express; rows with
    * w ≤ 0 never win (filtered — the honest zero-weight semantics).
    *
    * Determinism: u is the md5 coordinate; the key floor-quantizes at
    * 1e-9 into a LONG (the mix-audit ln discipline — raw libm doubles
    * never cross the gate) and ranks tie-break (key DESC, id ASC).
    *
    * Distributed shape: one projection + one per-stratum top-k window
    * — Spark's WindowGroupLimit keeps each partition's local top k
    * before the exchange, so ~k·|strata| rows shuffle regardless of
    * corpus size (the [[graft.similarity.BruteForceKNN]] note). No
    * join, no global sort, no second pass.
    */
  def weightedTopK(df: DataFrame, idCol: String, strataCol: String,
      weightCol: String, k: Int, salt: String = "aes"): DataFrame = {
    require(k >= 1, s"k must be at least 1, got $k")
    val u = (hash32(concat(lit(s"$salt:"), col(idCol).cast("string")))
      .cast("double") + 0.5) / Bucket
    val keyQ = floor(log(u) / col(weightCol).cast("double") * 1e9)
      .cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol).orderBy(desc("key_q"), col(idCol).asc)
    df.filter(col(weightCol).cast("double") > 0)
      .select(col(strataCol), col(idCol), keyQ.as("key_q"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(strataCol), col("rank"), col(idCol), col("key_q"))
  }

  def temperatureSample(df: DataFrame, idCol: String, strataCol: String,
      temperature: Double = 2.0, targetFrac: Double = 0.5,
      salt: String = "temp"): DataFrame = {
    require(temperature > 0, s"temperature must be positive, got $temperature")
    def weight(n: Column): Column =
      if (temperature == 2.0) sqrt(n.cast("double"))
      else pow(n.cast("double"), 1.0 / temperature)
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    val totals = counts.agg(
      sum(col("__n")).as("__total"), // integer sum: order-free, exact
      aggregate(
        sort_array(collect_list(struct(col(strataCol), col("__n")))),
        lit(0.0d),
        (acc, x) => acc + weight(x.getField("__n"))).as("__wsum"))
    val rates = counts.crossJoin(broadcast(totals))
      .select(col(strataCol),
        least(lit(1.0d),
          lit(targetFrac) * col("__total").cast("double") * weight(col("__n"))
            / col("__wsum") / col("__n").cast("double")).as("__rate"))
    df.join(broadcast(rates), strataCol)
      .filter(coordinate(col(idCol), salt) < col("__rate"))
      .drop("__rate")
  }
}
