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
  * Variant note: with `Config.residual = false` codes quantize the
  * GLOBAL vector; with `residual = true` they quantize the residual to
  * the vector's own coarse cell (`floor(q − centroid)`) — the
  * FAISS-default IVFADC encoding, which spends the same code budget on
  * a much smaller-diameter distribution (recall up at equal bits on
  * CLUSTERED data — measured recall@10 0.70 residual vs 0.59 global
  * on the spec's 8-cluster corpus; parity on the unclustered uniform
  * fixture where residuals don't shrink anything, IvfPqSpec).
  * The trade: residual codes couple to the coarse layout (cell retrain
  * ⇒ re-code), and each query builds one ADC LUT PER PROBED CELL
  * (nProbe× LUT work — still query-side-tiny) instead of one total.
  * The `floor` matters: a raw residual (integer quantized component −
  * rational centroid mean) would leave the fixed-point domain, making
  * the PQ trainer's distributed sums order-DEPENDENT; flooring
  * re-enters it, so every centroid sum stays an exact integer sum and
  * the DuckDB oracle reproduces the whole pipeline bit-for-bit. The
  * sub-unit truncation is 2^-20 of a component — noise relative to the
  * 16-cell-per-subspace quantization the codes then apply.
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
      residual: Boolean = false,
      pq: ProductQuant.Config = ProductQuant.Config()) {
    require(cells >= 1 && coarseIters >= 1 && nProbe >= 1)
    def coarseCfg: KMeans.Config = KMeans.Config(
      k = cells, iters = coarseIters, scaleBits = pq.scaleBits)
  }

  /** Driver-side mirror of [[graft.expressions.NearestCentroid]]'s
    * argmin (identical IEEE operand order and smaller-id tie-break)
    * followed by the floored residual — used to turn the shared seed
    * collect's GLOBAL vectors into the residual-space seeds the
    * residual PQ trainer needs, without a second job.
    */
  private[similarity] def residualOf(q: Array[Double],
      cents: Seq[KMeans.Centroid]): Array[Double] = {
    val qn = KMeans.leftFoldSq(q)
    var best: KMeans.Centroid = null
    var bestD = 0.0
    cents.foreach { c =>
      var dot = 0.0
      var i = 0
      while (i < q.length) { dot += q(i) * c.cv(i); i += 1 }
      val d = (qn + c.cn) - 2.0 * dot
      if (best == null || d < bestD || (d == bestD && c.cid < best.cid)) {
        best = c; bestD = d
      }
    }
    val r = new Array[Double](q.length)
    var i = 0
    while (i < q.length) { r(i) = math.floor(q(i) - best.cv(i)); i += 1 }
    r
  }

  /** A trained IVFADC model: the coarse codebook and the `m` PQ
    * subspace codebooks — driver-side, (cells + m·codeK)·(dim/…)
    * doubles total; everything else (the coded corpus) is data.
    */
  case class Model(coarse: Seq[KMeans.Centroid],
      books: Seq[Seq[KMeans.Centroid]])

  /** Deterministic content hash of a frozen model: MD5 over the
    * centroid ids and raw double BITS in canonical order (subspace,
    * cid, coefficient). [[IvfPqTable.readModel]] round-trips parquet
    * exactly (the bit-reproducibility contract), so a model and its
    * reopened epoch hash EQUAL — which is what lets the table-backed
    * index validate that an append's caller-held model IS the epoch in
    * force ([[IvfPqTable.append]]). `cn` is derived from `cv` and
    * excluded.
    */
  def modelHash(model: Model): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = new Array[Byte](8)
    def putLong(l: Long): Unit = {
      var i = 0
      while (i < 8) { buf(i) = (l >>> (56 - 8 * i)).toByte; i += 1 }
      md.update(buf)
    }
    def putCent(part: Int, c: KMeans.Centroid): Unit = {
      putLong(part.toLong); putLong(c.cid)
      c.cv.foreach(d => putLong(java.lang.Double.doubleToLongBits(d)))
    }
    model.coarse.foreach(putCent(-1, _))
    model.books.zipWithIndex.foreach { case (cents, s) =>
      cents.foreach(putCent(s, _))
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** (vid, v, nrm, q, qn): the quantized prep every stage scans. */
  private[similarity] def prepare(vectors: DataFrame, idCol: String, vecCol: String,
      cfg: Config): DataFrame =
    vectors
      .select(col(idCol).cast("long").as("vid"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", norm2(col("v")))
      .withColumn("q", transform(col("v"),
        x => floor(x * lit(cfg.pq.kmCfg.scale)).cast("double")))
      .withColumn("qn", DotProduct(col("q"), col("q")))

  // floored residual to a cell's centroid — floor re-enters the
  // fixed-point domain (doc comment above) so the residual PQ
  // trainer's sums stay exact integers. Native codegen'd pass
  // (FloorResidual — the codebook rides as one flat array); the
  // declarative zip_with formulation below is the ScalaCheck'd
  // reference (FloorResidualProps), per the interpreted-HOF
  // discipline.
  private def residTo(coarse: Seq[KMeans.Centroid], q: Column,
      cell: Column): Column =
    graft.expressions.FloorResidual(q, cell,
      coarse.map(_.cid), coarse.map(_.cv))

  /** The HOF reference formulation residTo replaced — kept for the
    * equivalence property: `zip_with` against a literal cell→centroid
    * map, flooring each component difference.
    */
  private[similarity] def residToHof(coarse: Seq[KMeans.Centroid],
      q: Column, cell: Column): Column = {
    val centMap = map_from_arrays(
      array(coarse.map(c => lit(c.cid)): _*),
      array(coarse.map(c => array(c.cv.map(lit).toSeq: _*)): _*))
    zip_with(q, element_at(centMap, cell),
      (a, b) => floor(a - b).cast("double"))
  }

  /** Train coarse + PQ codebooks over a (cached) prep frame. ONE seed
    * collect feeds both trainers (smallest-id seeding is shared
    * policy; slicing/truncating happens driver-side).
    *
    * Global (non-residual) encoding trains FUSED
    * ([[fitModelFused]]): the PQ books quantize the same `q` the
    * coarse trainer scans, so the two refinement chains are
    * independent and each round collapses to ONE aggregate job.
    * Residual encoding keeps the sequential path — its PQ input is
    * defined by the FINISHED coarse codebook.
    */
  private[similarity] def fitModel(prep: DataFrame, dim: Int, cfg: Config): Model =
    if (cfg.residual) fitModelSequential(prep, dim, cfg)
    else fitModelFused(prep, dim, cfg)

  private[similarity] def fitModelSequential(prep: DataFrame, dim: Int,
      cfg: Config): Model = {
    val seedRows = KMeans.seedRows(prep, math.max(cfg.cells, cfg.pq.codeK))
    val coarse = KMeans.centroidsPrepared(prep, cfg.coarseCfg, Some(seedRows))
    val codeSrc = codeSource(prep, coarse, cfg)
    val pqSeeds =
      if (!cfg.residual) seedRows
      else seedRows.map { case (vid, q) => (vid, residualOf(q, coarse)) }
    val books = ProductQuant.trainPrepared(
      codeSrc.select(col("vid"), col("cq").as("q")), dim, cfg.pq,
      Some(pqSeeds))
    Model(coarse, books)
  }

  /** The fused trainer (global encoding only): per refinement round,
    * coarse assignment and all `m` PQ subspace assignments project in
    * one pass, and BOTH trainers' (cluster, position) integer sums ride
    * ONE map-side-combined aggregate — the per-row explode tags each
    * (pos, x) twice (tag 0 = coarse label, tag 1 = its subspace's PQ
    * label), so the collected state is the exact UNION of the two
    * sequential collects (no cross-product grouping — the large-k
    * regime keeps its bounds), and each round costs ONE job instead of
    * two. Arithmetic is bit-identical to the sequential path: same
    * argmins, same integer sums, same one-division means
    * ([[IvfPqSpec]] asserts Model equality; every IVFADC oracle
    * re-proves it end-to-end).
    */
  private[similarity] def fitModelFused(prep: DataFrame, dim: Int,
      cfg: Config): Model = {
    require(!cfg.residual, "fused training is the global-encoding path")
    require(dim % cfg.pq.m == 0, s"dim $dim must divide by m=${cfg.pq.m}")
    val sub = dim / cfg.pq.m
    val seedRows = KMeans.seedRows(prep, math.max(cfg.cells, cfg.pq.codeK))
    var coarse = KMeans.fromSeedRows(seedRows.take(cfg.cells))
    var books: Seq[Seq[KMeans.Centroid]] = (0 until cfg.pq.m).map { s =>
      seedRows.take(cfg.pq.codeK).map { case (vid, full) =>
        val cv = full.slice(s * sub, (s + 1) * sub)
        KMeans.Centroid(vid, cv, KMeans.leftFoldSq(cv))
      }
    }
    def qs(s: Int): Column = slice(col("q"), s * sub + 1, sub)
    def qns(s: Int): Column = DotProduct(qs(s), qs(s))
    for (round <- 2 to math.max(cfg.coarseIters, cfg.pq.iters)) {
      val refineCoarse = round <= cfg.coarseIters
      val refinePq = round <= cfg.pq.iters
      // labels materialize in their own projection BELOW the explodes
      // (the ExtractGenerator hoisting discipline — see
      // ProductQuant.trainPrepared)
      val labelCols =
        (if (refineCoarse)
          Seq(KMeans.bestStruct(coarse, col("q"), col("qn"))
            .getField("c").as("cc"))
        else Nil) ++
        (if (refinePq)
          Seq(array((0 until cfg.pq.m).map { s =>
            KMeans.bestStruct(books(s), qs(s), qns(s)).getField("c")
          }: _*).as("ls"))
        else Nil)
      val entries =
        (if (refineCoarse)
          Seq(struct(lit(0).as("tag"), col("cc").as("cl"),
            col("pos"), col("x")))
        else Nil) ++
        (if (refinePq)
          Seq(struct(lit(1).as("tag"),
            element_at(col("ls"),
              (col("pos") / lit(sub)).cast("int") + 1).as("cl"),
            col("pos"), col("x")))
        else Nil)
      val keep = (if (refineCoarse) Seq(col("cc")) else Nil) ++
        (if (refinePq) Seq(col("ls")) else Nil)
      val rows = prep
        .select(col("q") +: labelCols: _*)
        .select(keep :+ posexplode(col("q")).as(Seq("pos", "x")): _*)
        .select(explode(array(entries: _*)).as("e"))
        .select(col("e.tag").as("tag"), col("e.cl").as("cl"),
          col("e.pos").as("pos"), col("e.x").as("x"))
        .groupBy("tag", "cl", "pos")
        .agg(sum("x").as("sm"), count(lit(1)).as("n"))
        .collect()
      def rebuild(sel: org.apache.spark.sql.Row => Boolean,
          posOf: Int => Int): Seq[KMeans.Centroid] =
        rows.filter(r => sel(r))
          .groupBy(_.getLong(1)).toSeq.sortBy(_._1)
          .map { case (cid, rs) =>
            val cv = rs.sortBy(r => posOf(r.getInt(2)))
              .map(r => r.getDouble(3) / r.getLong(4)).toArray
            KMeans.Centroid(cid, cv, KMeans.leftFoldSq(cv))
          }
      if (refineCoarse)
        coarse = rebuild(_.getInt(0) == 0, identity)
      if (refinePq)
        books = (0 until cfg.pq.m).map { s =>
          rebuild(r => r.getInt(0) == 1 && r.getInt(2) / sub == s,
            _ % sub)
        }
    }
    Model(coarse, books)
  }

  /** prep + (cell, cq): `cq` is the vector the PQ codebooks quantize —
    * global, or the residual to the row's own cell.
    */
  private def codeSource(prep: DataFrame, coarse: Seq[KMeans.Centroid],
      cfg: Config): DataFrame = {
    val cellCol =
      KMeans.bestStruct(coarse, col("q"), col("qn")).getField("c").as("cell")
    if (!cfg.residual)
      prep.withColumn("cell", cellCol).withColumn("cq", col("q"))
    else
      prep.withColumn("cell", cellCol)
        .withColumn("cq", residTo(coarse, col("q"), col("cell")))
  }

  private def cqSlice(s: Int, sub: Int): Column =
    slice(col("cq"), s * sub + 1, sub)
  private def cqNorm(s: Int, sub: Int): Column =
    DotProduct(cqSlice(s, sub), cqSlice(s, sub))

  /** Code a frame with a FROZEN model: (vid, v, nrm, cell, c0..c{m-1})
    * — coarse cell + m PQ codes, one pure stateless projection (the
    * [[KMeans.label]] serving contract: no training, no shuffle, runs
    * identically on batch or streaming frames). Rows are EXACTLY what
    * [[writeIndex]] would produce for them under this model — the
    * append path's contract ([[appendToIndex]]).
    */
  def code(vectors: DataFrame, idCol: String, vecCol: String, dim: Int,
      model: Model, cfg: Config = Config()): DataFrame =
    coded(prepare(vectors, idCol, vecCol, cfg), model, dim, cfg)

  private[similarity] def coded(prep: DataFrame, model: Model, dim: Int,
      cfg: Config): DataFrame = {
    val sub = dim / cfg.pq.m
    codeSource(prep, model.coarse, cfg).select(
      col("vid") +: col("v") +: col("nrm") +: col("cell") +:
        model.books.zipWithIndex.map { case (cents, s) =>
          KMeans.bestStruct(cents, cqSlice(s, sub), cqNorm(s, sub))
            .getField("c").as(s"c$s")
        }: _*)
  }

  /** Probes: nProbe nearest cells per query in the SAME quantized
    * distance (ties toward the smaller cell id); the query set is
    * tiny, so the query × cells fan-out and its window are driver-
    * negligible and the result broadcasts. The ADC LUTs build AFTER
    * the probe cut, from the probe-relative vector (global: the query
    * itself; residual: its floored residual to the PROBED cell — one
    * LUT set per (query, cell), the residual-IVFADC shape).
    */
  private[similarity] def probes(queriesPrep: DataFrame, model: Model, dim: Int,
      cfg: Config): DataFrame = {
    val sub = dim / cfg.pq.m
    // coarse probe distances and per-subspace ADC LUTs both ride
    // CentroidDistMap — ONE flat-array expression per codebook instead
    // of k literal DotProduct trees (constant plan/codegen size in k;
    // bit-equal arithmetic, see the expression's contract)
    val coarseDists = graft.expressions.CentroidDistMap(
      col("q"), col("qn"),
      model.coarse.map(_.cid), model.coarse.map(_.cn),
      model.coarse.map(_.cv))
    val wp = Window.partitionBy("q_id").orderBy(asc("cd"), asc("cell"))
    val lutCols = model.books.zipWithIndex.map { case (cents, s) =>
      graft.expressions.CentroidDistMap(
        cqSlice(s, sub), cqNorm(s, sub),
        cents.map(_.cid), cents.map(_.cn), cents.map(_.cv)).as(s"lut$s")
    }
    queriesPrep
      .select(col("vid").as("q_id"), col("v").as("pv"), col("nrm").as("pn"),
        col("q"), explode(coarseDists).as(Seq("cell", "cd")))
      .withColumn("prn", row_number().over(wp))
      .filter(col("prn") <= cfg.nProbe)
      .withColumn("cq",
        if (cfg.residual) residTo(model.coarse, col("q"), col("cell"))
        else col("q"))
      .select(Seq(col("q_id"), col("pv"), col("pn"),
        col("cell")) ++ lutCols: _*)
  }

  /** ADC screen over probed cells + exact-cosine re-rank — the search
    * tail shared by the train-and-search and the served-index paths.
    */
  private[similarity] def search(codedDocs: DataFrame, probeSet: DataFrame, k: Int,
      cfg: Config): DataFrame = {
    // ADC over probed cells only: broadcast HASH join on the cell id —
    // the corpus never meets a query outside its probed cells
    val dist = (0 until cfg.pq.m)
      .map(s => element_at(col(s"lut$s"), col(s"c$s")))
      .reduceLeft(_ + _)
    val screened = codedDocs.join(broadcast(probeSet), "cell")
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

  /** Top-k neighbors per query: probe `nProbe` coarse cells, ADC-screen
    * their members to `pq.screenK`, exact-cosine re-rank to k. Output:
    * (q_id, rank, n_id, cos_sim, dist_pq).
    */
  def topK(vectors: DataFrame, idCol: String, vecCol: String, dim: Int,
      isQuery: Column => Column, k: Int, cfg: Config = Config()): DataFrame = {
    require(cfg.pq.screenK >= k, "screenK must be >= k")
    // ONE persisted quantized frame: coarse trainer + PQ trainer + the
    // coded-corpus projection + the query probes all scan this cache
    val prep = prepare(vectors, idCol, vecCol, cfg).persist()
    val model = fitModel(prep, dim, cfg)
    search(coded(prep, model, dim, cfg),
      probes(prep.filter(isQuery(col("vid"))), model, dim, cfg), k, cfg)
  }

  // ------------------------------------------------------ persisted index

  /** Write a trained index as catalog tables — the staging-table form a
    * recurring serving/ingest pipeline reads instead of retraining:
    *
    *   - `<table>`: the coded corpus, `partitionBy("cell")` — each
    *     coarse cell is its own partition directory, so a served query
    *     batch READS ONLY ITS PROBED CELLS (scan-level partition
    *     pruning; at 100 TB that is nProbe/cells of the corpus instead
    *     of all of it);
    *   - `<table>_model`: the codebooks, one row per centroid
    *     (part = -1 coarse, s = PQ subspace s). Doubles round-trip
    *     parquet exactly, so a reread model reproduces the training
    *     run's results bit-for-bit ([[IvfPqIndexSpec]]).
    */
  def writeIndex(vectors: DataFrame, idCol: String, vecCol: String,
      dim: Int, table: String, cfg: Config = Config()): Model = {
    val spark = vectors.sparkSession
    val prep = prepare(vectors, idCol, vecCol, cfg).persist()
    val model = fitModel(prep, dim, cfg)
    coded(prep, model, dim, cfg)
      .write.partitionBy("cell").mode("overwrite").saveAsTable(table)
    prep.unpersist(blocking = false)
    val rows = model.coarse.map(c => (-1, c.cid, c.cv.toSeq)) ++
      model.books.zipWithIndex.flatMap { case (cents, s) =>
        cents.map(c => (s, c.cid, c.cv.toSeq))
      }
    import spark.implicits._
    rows.toDF("part", "cid", "cv")
      .write.mode("overwrite").saveAsTable(s"${table}_model")
    model
  }

  /** Reopen a [[writeIndex]]-persisted model (norms recomputed with the
    * same left fold the trainer used — exact).
    */
  def readModel(spark: org.apache.spark.sql.SparkSession,
      table: String): Model = {
    val rows = spark.table(s"${table}_model")
      .select("part", "cid", "cv").collect()
      .map(r => (r.getInt(0), KMeans.Centroid(r.getLong(1),
        r.getSeq[Double](2).toArray,
        KMeans.leftFoldSq(r.getSeq[Double](2).toArray))))
    val coarse = rows.filter(_._1 == -1).map(_._2).sortBy(_.cid).toSeq
    val books = rows.filter(_._1 >= 0).groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.map(_._2).sortBy(_.cid).toSeq)
    Model(coarse, books)
  }

  /** Code a NEW batch with the frozen model and append it to the
    * persisted index — the operational ingest loop: the same index
    * serves queries AND grows per ingest batch, with no retraining and
    * no re-coding of the standing corpus (appended rows land in their
    * cells' partition directories; the probed-cell pruning of
    * [[topKIndexed]] applies to them immediately). Residual or global,
    * a row's codes depend only on the frozen codebooks and the row
    * itself, so append-then-serve ≡ coding the union up front
    * (spec'd in IvfPqIndexSpec). Name-based append (`saveAsTable`):
    * the catalog table stores the partition column last, position-based
    * insertion would silently scramble columns.
    */
  def appendToIndex(batch: DataFrame, idCol: String, vecCol: String,
      dim: Int, table: String, model: Model,
      cfg: Config = Config()): Unit =
    code(batch, idCol, vecCol, dim, model, cfg)
      .write.partitionBy("cell").mode("append").saveAsTable(table)

  /** Serve a query batch from a persisted index: zero training jobs,
    * and the coded-corpus scan is restricted to the PROBED cells via a
    * partition-pruning IN filter (the probe set is queries × nProbe
    * rows — collecting its distinct cells is a driver-trivial job).
    * Output and semantics are [[topK]]'s; [[IvfPqIndexSpec]] asserts
    * row equality against the train-and-search path and the pruned
    * scan shape.
    */
  def topKIndexed(spark: org.apache.spark.sql.SparkSession, table: String,
      queries: DataFrame, idCol: String, vecCol: String, dim: Int, k: Int,
      cfg: Config = Config(), model: Option[Model] = None): DataFrame =
    topKIndexedScoped(spark, table, queries, idCol, vecCol, dim, k,
      cfg, model)._1

  /** [[topKIndexed]] with its internal persisted probe frame handed
    * back, so a PER-MICRO-BATCH caller ([[graft.streaming.AnnServe]])
    * can release exactly that cache after consuming the result — a
    * blanket `catalog.clearCache()` there would also unpersist every
    * user-cached relation sharing the session. The result is lazy and
    * references the handle: unpersist AFTER consuming.
    */
  private[graft] def topKIndexedScoped(
      spark: org.apache.spark.sql.SparkSession, table: String,
      queries: DataFrame, idCol: String, vecCol: String, dim: Int, k: Int,
      cfg: Config = Config(),
      model: Option[Model] = None): (DataFrame, DataFrame) = {
    require(cfg.pq.screenK >= k, "screenK must be >= k")
    val m = model.getOrElse(readModel(spark, table))
    val probeSet = probes(
      prepare(queries, idCol, vecCol, cfg), m, dim, cfg).persist()
    val cells = probeSet.select("cell").distinct().collect()
      .map(_.getLong(0)).sorted
    val codedDocs = spark.table(table)
      .filter(col("cell").isin(cells.map(c => c: Any): _*))
    (search(codedDocs, probeSet, k, cfg), probeSet)
  }
}
