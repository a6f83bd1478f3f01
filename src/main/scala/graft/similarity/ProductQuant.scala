package graft.similarity

import graft.expressions.DotProduct
import graft.similarity.Cosine._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization (PQ) nearest-neighbor search: the standard
  * billion-scale ANN compression. The vector space splits into `m`
  * subspaces; each subspace gets its own [[KMeans]]-trained codebook of
  * `codeK` centroids; a document is stored as `m` small codes (here
  * 8 × 4 bits of information per 64-dim vector vs 64 × 8 bits for
  * [[ScalarQuant]] — a further 8× compression); a query scores a
  * document by summing, per subspace, its precomputed distance to the
  * document's code centroid (asymmetric distance computation — the
  * query side stays unquantized, only documents are coded).
  *
  * Search shape: document codes are computed by the same
  * literal-centroid codegen'd argmin the trainer uses (zero shuffle);
  * each query carries one tiny literal-derived LUT
  * (`map(cid → dist)` per subspace, built from the same trained
  * centroids), so scoring a candidate is `m` map lookups and an add
  * chain — no vector arithmetic per pair at all. The top `screenK`
  * survivors re-rank by EXACT float cosine (the [[ScalarQuant]]
  * discipline: reported similarities carry no quantization error, only
  * recall can move).
  *
  * Determinism: training inherits [[KMeans]]'s fixed-point exactness
  * per subspace (quantize-then-slice ≡ slice-then-quantize — floor is
  * elementwise); every ADC distance is `qn_s + cn_s − 2·q_s·c_s`
  * summed left-to-right over subspaces — the DuckDB oracle recomputes
  * all `m` training chains, the code assignments, the per-(query, cid)
  * distance table and the same sum, so the whole pipeline
  * hash-matches.
  */
object ProductQuant {

  /** `m` subspaces × `codeK` codes; `screenK` candidates kept per query
    * before exact re-rank. Vector dim must divide evenly by `m`.
    */
  case class Config(m: Int = 8, codeK: Int = 16, iters: Int = 2,
      screenK: Int = 20, scaleBits: Int = 20) {
    require(m >= 1 && codeK >= 2 && iters >= 1 && screenK >= 1)
    def kmCfg: KMeans.Config =
      KMeans.Config(k = codeK, iters = iters, scaleBits = scaleBits)
  }

  /** Per-subspace trained codebooks (driver-side, k·d/m doubles each).
    *
    * Trains ALL `m` subspaces through SHARED jobs rather than m
    * independent [[KMeans.centroids]] runs: one seed collect covers
    * every subspace (the seed rows' full vectors slice driver-side),
    * and each refinement is ONE projection (m literal-centroid argmins
    * producing a label array) + ONE map-side-combined
    * (position, label) aggregate whose collect is m·k·(dim/m) sums.
    * Identical arithmetic to the per-subspace trainer — integer sums
    * don't care how the jobs are batched — measured 6.5 s → ~1.5 s at
    * sf0.1 purely from deleting ~25 per-subspace job launches.
    */
  def train(vectors: DataFrame, idCol: String, vecCol: String, dim: Int,
      cfg: Config = Config()): Seq[Seq[KMeans.Centroid]] = {
    val scale = cfg.kmCfg.scale
    val prep = vectors
      .select(col(idCol).cast("long").as("vid"),
        transform(col(vecCol).cast("array<double>"),
          x => floor(x * lit(scale)).cast("double")).as("q"))
      .persist()
    try trainPrepared(prep, dim, cfg)
    finally prep.unpersist(blocking = false)
  }

  /** [[train]] over an existing (vid, q: quantized array<double>)
    * frame — lets [[topK]] (and [[IvfPq]]) share one persisted prep
    * with the search.
    */
  private[similarity] def trainPrepared(prep: DataFrame, dim: Int,
      cfg: Config,
      preSeeds: Option[Seq[(Long, Array[Double])]] = None): Seq[Seq[KMeans.Centroid]] = {
    require(dim % cfg.m == 0, s"dim $dim must divide by m=${cfg.m}")
    val sub = dim / cfg.m

    // one collect seeds every subspace (or reuse a caller's collect —
    // IvfPq seeds coarse + all PQ subspaces from a single job)
    val seedRows = preSeeds.fold(KMeans.seedRows(prep, cfg.codeK))(
      _.take(cfg.codeK))
    var books: Seq[Seq[KMeans.Centroid]] = (0 until cfg.m).map { s =>
      seedRows.map { case (vid, full) =>
        val cv = full.slice(s * sub, (s + 1) * sub)
        KMeans.Centroid(vid, cv, KMeans.leftFoldSq(cv))
      }
    }
    def qs(s: Int): Column = slice(col("q"), s * sub + 1, sub)
    def qns(s: Int): Column = DotProduct(qs(s), qs(s))
    for (_ <- 2 to cfg.iters) {
      // one job refines every subspace: label array + (pos, label) sums
      val labels = array((0 until cfg.m).map { s =>
        KMeans.bestStruct(books(s), qs(s), qns(s)).getField("c")
      }: _*)
      // The label array MUST become an attribute in its own projection
      // BELOW the explode: with the array and the generator in one
      // select, ExtractGenerator hoists the non-generator expression
      // into the Project above Generate, re-evaluating all m argmins
      // (m·codeK DotProduct folds) once per exploded element — a dim×
      // blow-up measured at ~10 s vs 0.2 s on 2000×64 vectors. Staged,
      // the plan keeps Project(ls) under Generate (computed once/row).
      val rows = prep
        .select(col("q"), labels.as("ls"))
        .select(col("ls"), posexplode(col("q")).as(Seq("pos", "x")))
        .select(col("pos"),
          element_at(col("ls"),
            (col("pos") / lit(sub)).cast("int") + 1).as("cl"),
          col("x"))
        .groupBy("pos", "cl")
        .agg(sum("x").as("sm"), count(lit(1)).as("n"))
        .collect()
      books = (0 until cfg.m).map { s =>
        rows.filter(_.getInt(0) / sub == s)
          .groupBy(_.getLong(1)).toSeq.sortBy(_._1)
          .map { case (cid, rs) =>
            val cv = rs.sortBy(_.getInt(0)).map(r =>
              r.getDouble(2) / r.getLong(3)).toArray
            KMeans.Centroid(cid, cv, KMeans.leftFoldSq(cv))
          }
      }
    }
    books
  }

  /** Top-k neighbors per query: ADC screen over PQ codes to `screenK`,
    * exact cosine re-rank to k. Output:
    * (q_id, rank, n_id, cos_sim, dist_pq).
    */
  def topK(vectors: DataFrame, idCol: String, vecCol: String, dim: Int,
      isQuery: Column => Column, k: Int, cfg: Config = Config()): DataFrame = {
    require(cfg.screenK >= k, "screenK must be >= k")
    val sub = dim / cfg.m
    val scale = cfg.kmCfg.scale

    // ONE persisted quantized frame feeds both the trainer's iteration
    // scans and the search's code/LUT projections (the trainPrepared
    // doc-comment contract).
    val prep = vectors
      .select(col(idCol).cast("long").as("vid"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", norm2(col("v")))
      .withColumn("q", transform(col("v"),
        x => floor(x * lit(scale)).cast("double")))
      .persist()
    val books = trainPrepared(prep, dim, cfg)
    def qs(s: Int): Column = slice(col("q"), s * sub + 1, sub)
    def qns(s: Int): Column = DotProduct(qs(s), qs(s))

    // documents: m codegen'd argmins → m codes (a pure projection)
    val coded = prep.select(
      col("vid") +: col("v") +: col("nrm") +:
        books.zipWithIndex.map { case (cents, s) =>
          KMeans.bestStruct(cents, qs(s), qns(s)).getField("c").as(s"c$s")
        }: _*)

    // queries: per subspace a cid→distance map (ADC LUT) — one
    // flat-array CentroidDistMap per codebook, not k literal
    // DotProduct trees (constant plan size; bit-equal arithmetic)
    val luts = prep.filter(isQuery(col("vid")))
      .select(
        col("vid").as("q_id") +: col("v").as("pv") +: col("nrm").as("pn") +:
          books.zipWithIndex.map { case (cents, s) =>
            graft.expressions.CentroidDistMap(qs(s), qns(s),
              cents.map(_.cid), cents.map(_.cn), cents.map(_.cv))
              .as(s"lut$s")
          }: _*)

    // ADC: m map lookups + a left-assoc add chain per candidate
    val dist = (0 until cfg.m)
      .map(s => element_at(col(s"lut$s"), col(s"c$s")))
      .reduceLeft(_ + _)
    val screened = coded.join(broadcast(luts), col("vid") =!= col("q_id"))
      .select(col("q_id"), col("vid").as("n_id"), col("pv"), col("pn"),
        col("v"), col("nrm"), dist.as("dist_pq"))
    val ws = Window.partitionBy("q_id").orderBy(asc("dist_pq"), asc("n_id"))
    val cands = screened.withColumn("srank", row_number().over(ws))
      .filter(col("srank") <= cfg.screenK)
      .select(col("q_id"), col("n_id"), col("dist_pq"),
        cosineWithNorms(dot(col("pv"), col("v")), col("pn"), col("nrm"))
          .as("cos_sim"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos_sim"), asc("n_id"))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "cos_sim", "dist_pq")
  }
}
