package graft.similarity

import graft.expressions.DotProduct
import graft.similarity.Cosine._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVFADC — the composed billion-scale ANN layout: a trained coarse
  * quantizer prunes the corpus to the cells a query probes, and
  * product-quantization codes make scoring a surviving candidate `m`
  * map lookups (asymmetric distance), with the final ranking by EXACT
  * float cosine over the few screened survivors.
  *
  * This closes the gap the standalone faces leave open: [[IVFIndex]]
  * prunes but scores full vectors; [[ProductQuant]] compresses but
  * screens the WHOLE corpus per query. Composed, per query the work is
  * |corpus|/cells × nProbe ADC lookups — the FAISS-style IVFADC shape
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011) — and the corpus-side screen join is keyed on the cell
  * id, never query × corpus.
  *
  * Variant note: codes quantize the GLOBAL vector, not the residual
  * (x − centroid). Residual coding buys recall at equal code budget
  * but couples every code to its cell's centroid (re-coding on cell
  * retrain); the global-code variant keeps the PQ index reusable
  * across coarse layouts. Documented trade, measured by the recall
  * spec against brute force.
  *
  * Scale shape: ONE persisted quantized corpus frame feeds coarse
  * training, PQ training, and the coded-corpus projection (zero extra
  * scans); both codebooks ride the plan as flat-array objects
  * ([[graft.expressions.NearestCentroid]]), so cells can grow toward
  * the √N regime; the probe set (queries × nProbe rows + per-query
  * ADC LUTs) broadcasts; the screen is a broadcast HASH join on
  * `cell`. Determinism: every stage inherits [[KMeans]]'s fixed-point
  * exactness, probe ties break toward the smaller cell id, and the
  * DuckDB oracle replays coarse chain, PQ chains, probes, ADC sums
  * and re-rank bit-for-bit.
  */
object IvfPq {

  /** `cells` coarse centroids (trained, `coarseIters` Lloyd's passes),
    * `nProbe` cells probed per query; PQ knobs in `pq`. The coarse
    * trainer shares the PQ quantization scale so one quantized frame
    * serves both.
    */
  case class Config(cells: Int = 8, coarseIters: Int = 2, nProbe: Int = 2,
      pq: ProductQuant.Config = ProductQuant.Config()) {
    require(cells >= 1 && coarseIters >= 1 && nProbe >= 1)
    def coarseCfg: KMeans.Config = KMeans.Config(
      k = cells, iters = coarseIters, scaleBits = pq.scaleBits)
  }

  /** Top-k neighbors per query: probe `nProbe` coarse cells, ADC-screen
    * their members to `pq.screenK`, exact-cosine re-rank to k. Output:
    * (q_id, rank, n_id, cos_sim, dist_pq).
    */
  def topK(vectors: DataFrame, idCol: String, vecCol: String, dim: Int,
      isQuery: Column => Column, k: Int, cfg: Config = Config()): DataFrame = {
    require(cfg.pq.screenK >= k, "screenK must be >= k")
    val sub = dim / cfg.pq.m
    val scale = cfg.pq.kmCfg.scale

    // ONE persisted quantized frame: coarse trainer + PQ trainer + the
    // coded-corpus projection + the query probes all scan this cache
    val prep = vectors
      .select(col(idCol).cast("long").as("vid"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", norm2(col("v")))
      .withColumn("q", transform(col("v"),
        x => floor(x * lit(scale)).cast("double")))
      .withColumn("qn", DotProduct(col("q"), col("q")))
      .persist()
    // ONE seed collect feeds both trainers (smallest-id seeding is
    // shared policy; slicing/truncating happens driver-side)
    val seedRows = KMeans.seedRows(prep, math.max(cfg.cells, cfg.pq.codeK))
    val coarse = KMeans.centroidsPrepared(prep, cfg.coarseCfg, Some(seedRows))
    val books = ProductQuant.trainPrepared(prep, dim, cfg.pq, Some(seedRows))
    def qs(s: Int): Column = slice(col("q"), s * sub + 1, sub)
    def qns(s: Int): Column = DotProduct(qs(s), qs(s))

    // documents: coarse cell + m PQ codes — one pure projection
    val coded = prep.select(
      col("vid") +: col("v") +: col("nrm") +:
        KMeans.bestStruct(coarse, col("q"), col("qn")).getField("c").as("cell") +:
        books.zipWithIndex.map { case (cents, s) =>
          KMeans.bestStruct(cents, qs(s), qns(s)).getField("c").as(s"c$s")
        }: _*)

    // probes: nProbe nearest cells per query in the SAME quantized
    // distance (ties toward the smaller cell id); the query set is
    // tiny, so the query × cells fan-out and its window are driver-
    // negligible and the result broadcasts
    val cellRows = coarse.map(c =>
      struct(lit(c.cid).as("cell"),
        (col("qn") + lit(c.cn) -
          lit(2.0) * DotProduct(col("q"), array(c.cv.map(lit).toSeq: _*)))
          .as("cd")))
    val wp = Window.partitionBy("q_id").orderBy(asc("cd"), asc("cell"))
    val lutCols = books.zipWithIndex.map { case (cents, s) =>
      map_from_arrays(
        array(cents.map(c => lit(c.cid)): _*),
        array(cents.map { c =>
          qns(s) + lit(c.cn) -
            lit(2.0) * DotProduct(qs(s), array(c.cv.map(lit).toSeq: _*))
        }: _*)).as(s"lut$s")
    }
    val probes = prep.filter(isQuery(col("vid")))
      .select(
        col("vid").as("q_id") +: col("v").as("pv") +: col("nrm").as("pn") +:
          explode(array(cellRows: _*)).as("pc") +: lutCols: _*)
      .select(Seq(col("q_id"), col("pv"), col("pn"),
          col("pc.cell").as("cell"), col("pc.cd").as("cd")) ++
        (0 until cfg.pq.m).map(s => col(s"lut$s")): _*)
      .withColumn("prn", row_number().over(wp))
      .filter(col("prn") <= cfg.nProbe)
      .drop("cd", "prn")

    // ADC over probed cells only: broadcast HASH join on the cell id —
    // the corpus never meets a query outside its probed cells
    val dist = (0 until cfg.pq.m)
      .map(s => element_at(col(s"lut$s"), col(s"c$s")))
      .reduceLeft(_ + _)
    val screened = coded.join(broadcast(probes), "cell")
      .filter(col("vid") =!= col("q_id"))
      .select(col("q_id"), col("vid").as("n_id"), col("pv"), col("pn"),
        col("v"), col("nrm"), dist.as("dist_pq"))
    val ws = Window.partitionBy("q_id").orderBy(asc("dist_pq"), asc("n_id"))
    val cands = screened.withColumn("srank", row_number().over(ws))
      .filter(col("srank") <= cfg.pq.screenK)
      .select(col("q_id"), col("n_id"), col("dist_pq"),
        cosineWithNorms(dot(col("pv"), col("v")), col("pn"), col("nrm"))
          .as("cos_sim"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos_sim"), asc("n_id"))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "cos_sim", "dist_pq")
  }
}
