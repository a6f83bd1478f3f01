package graft.similarity

import graft.similarity.Cosine._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PCA over an embedding corpus — the completion of the linear-algebra
  * chain [[GramMatrix]] (exact moments) → eigensolve → projection:
  * top-c principal components by FIXED-STEP power iteration with
  * deflation, then the corpus projected onto them as a map-only scan.
  * The whitening/compression step in front of ANN and the "what
  * directions dominate this corpus" audit.
  *
  * Determinism (the hash-gate bar): the eigensolve is a FIXED number
  * of iterations of IEEE-exact operations (fused left-fold mat-vec,
  * correctly-rounded sqrt/divide) from a constant start vector — NOT
  * run to a tolerance — so the whole solve replays bit-for-bit in any
  * engine that follows the same operation order (the oracle unrolls
  * all iterations CTE-for-CTE). Covariance entries are derived from
  * [[GramMatrix]]'s exact integer moments through int64→double casts
  * (correctly rounded on both engines; the int128 numerator is NOT
  * used — its double cast is less portable) with a pinned formula:
  * `A(i)(j) = sxy/(n·2^40) − (sx/(n·2^20))·(sy/(n·2^20))`.
  *
  * Distributed shape (the 100 TB audit): fit = ONE [[GramMatrix]]
  * scan (d²-bounded aggregate) + driver math on d×d doubles (d = 64 →
  * 4 096 entries — the bounded-by-construction collect class);
  * project = a map-only scan with the c components riding the plan as
  * flat array literals ([[RandomProjection]]'s shape: no shuffle, no
  * join). Power iteration cost is c·T·d² driver flops — microseconds.
  */
object Pca {

  /** d-dim mean, c components (rows), and their eigenvalues. */
  case class Model(n: Long, mean: Array[Double],
      components: Array[Array[Double]], eigenvalues: Array[Double]) {
    def d: Int = mean.length
  }

  /** Default fixed iteration count — enough for well-separated top
    * eigenvalues; exactness never depends on convergence (both sides
    * replay the same T steps), only the spec's quality checks do.
    */
  val Iters = 40

  /** Fit from the exact moment frame (one distributed scan). */
  def fit(df: DataFrame, vecCol: String, c: Int,
      iters: Int = Iters): Model = {
    val cells = GramMatrix.upperTriangle(df, vecCol)
      .select("i", "j", "n", "sx_fp", "sy_fp", "sxy_fp")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    fitFromCells(cells, c, iters)
  }

  /** Fit from an already-maintained moment state — e.g. the running
    * state a [[graft.streaming.CovMonitor]] folds across micro-batches
    * (its cells ARE GramMatrix's, exactly mergeable), so a streaming
    * deployment refreshes its PCA model after every batch WITHOUT ever
    * rescanning the corpus: `fit(batch stream) ≡ fitFromState(running
    * state)` bit-for-bit (spec-asserted). Driver-only — no jobs.
    */
  def fitFromState(state: Map[(Int, Int),
        graft.streaming.CovMonitor.CellState],
      c: Int, iters: Int = Iters): Model =
    fitFromCells(state.map { case (k, s) => k -> (s.n, s.sx, s.sy, s.sxy) },
      c, iters)

  private def fitFromCells(
      cells: Map[(Int, Int), (Long, Long, Long, Long)],
      c: Int, iters: Int): Model = {
    val d = cells.keysIterator.map(_._2).max + 1
    val s1 = (1L << 20).toDouble
    val s2 = (1L << 40).toDouble
    // pinned entry formula — every cast is int64→double (correctly
    // rounded on both engines), every op order fixed
    def entry(i: Int, j: Int): Double = {
      val (n, sx, sy, sxy) = cells((math.min(i, j), math.max(i, j)))
      val (a, b) = if (i <= j) (sx, sy) else (sy, sx)
      sxy.toDouble / (n.toDouble * s2) -
        (a.toDouble / (n.toDouble * s1)) * (b.toDouble / (n.toDouble * s1))
    }
    var mat = Array.tabulate(d, d)(entry)
    val n = cells((0, 0))._1
    val mean = Array.tabulate(d) { i =>
      val sx = cells((i, i))._2
      sx.toDouble / (n.toDouble * s1)
    }
    val comps = Array.newBuilder[Array[Double]]
    val lams = Array.newBuilder[Double]
    for (_ <- 0 until c) {
      var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
      def matvec(x: Array[Double]): Array[Double] =
        Array.tabulate(d)(i =>
          (0 until d).foldLeft(0.0d)((s, j) => s + mat(i)(j) * x(j)))
      for (_ <- 1 to iters) {
        val u = matvec(v)
        val nrm = math.sqrt(
          (0 until d).foldLeft(0.0d)((s, i) => s + u(i) * u(i)))
        v = u.map(_ / nrm)
      }
      val w = matvec(v)
      val lam = (0 until d).foldLeft(0.0d)((s, i) => s + v(i) * w(i))
      comps += v
      lams += lam
      val vv = v
      mat = Array.tabulate(d, d)((i, j) => mat(i)(j) - lam * vv(i) * vv(j))
    }
    Model(n, mean, comps.result(), lams.result())
  }

  /** Whitened reduction (idCol, wproj array&lt;double&gt;): the centered
    * projection of each vector onto all c components, each coordinate
    * scaled by `1/sqrt(λ_c)` so every output dimension has unit
    * variance — the standard pre-conditioning in front of cosine/L2
    * ANN when raw dimensions dominate unevenly. Same map-only
    * literal-array scan as [[project]]: the scale folds into the
    * component literals at plan time (w'_k = w_k/sqrt(λ)), so
    * whitening costs nothing over projecting.
    */
  def whiten(df: DataFrame, idCol: String, vecCol: String,
      model: Model): DataFrame = {
    val cols = model.components.zip(model.eigenvalues).map {
      case (w, lam) =>
        val s = 1.0 / math.sqrt(lam)
        val ws = w.map(_ * s)
        val center = (0 until model.d)
          .foldLeft(0.0d)((k, i) => k + model.mean(i) * ws(i))
        dot(col(vecCol), typedLit(ws.toIndexedSeq)) - lit(center)
    }
    df.select(col(idCol), array(cols.toIndexedSeq: _*).as("wproj"))
  }

  /** Melted projection (idCol, comp, proj): each vector's coordinate
    * along each principal component, centered —
    * `proj = Σ v_k·w_k − Σ mean_k·w_k` (two pinned left folds, the
    * second a driver-side scalar). Map-only scan; components ride the
    * plan as literals.
    */
  def project(df: DataFrame, idCol: String, vecCol: String,
      model: Model): DataFrame = {
    val cols = model.components.map { w =>
      val center = (0 until model.d)
        .foldLeft(0.0d)((s, k) => s + model.mean(k) * w(k))
      dot(col(vecCol), typedLit(w.toIndexedSeq)) - lit(center)
    }
    df.select(col(idCol),
        posexplode(array(cols.toIndexedSeq: _*)).as(Seq("comp", "proj")))
      .select(col(idCol), col("comp"), col("proj"))
  }
}
