package graft.similarity

import graft.similarity.Cosine._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random-projection dimensionality reduction —
  * the real-valued companion of [[HyperplaneLSH]]: where LSH keeps only
  * the SIGN of each random projection (a bucket bit), this keeps the
  * projection VALUES, producing a p-dimensional sketch of a
  * d-dimensional embedding that approximately preserves pairwise
  * distances (the JL lemma) — the standard pre-reduction in front of
  * brute-force/IVF search and the cheap "is this corpus's geometry
  * stable under compression" audit.
  *
  * Determinism (the hash-gate bar): plane components reuse
  * [[HyperplaneLSH.planes]] — md5-derived, 3-decimal, SQL-literal
  * round-trippable — and each projection value is ONE left-fold dot
  * product ([[graft.expressions.DotProduct]] operand order), so every
  * output double is bit-identical to the oracle's `list_reduce` fold.
  *
  * Distributed shape (the 100 TB audit): a PURE PROJECTION — the p×d
  * plane matrix rides the plan as p array literals (like the
  * [[graft.expressions.NearestCentroid]] codebook: constant plan size,
  * shipped once per task like a broadcast), each row is p codegen'd
  * dot folds, no shuffle, no join, no state. Reducing 100 TB of
  * embeddings is a map-only scan.
  */
object RandomProjection {

  /** Default: 64-dim embeddings down to 16 projections. */
  def config(p: Int = 16, dim: Int = 64, seed: String = "rp"):
      HyperplaneLSH.Config =
    HyperplaneLSH.Config(numPlanes = p, dim = dim, seed = seed)

  /** The p projection expressions of an array&lt;float|double&gt; column. */
  private def projections(v: Column, cfg: HyperplaneLSH.Config): Seq[Column] =
    HyperplaneLSH.planes(cfg).map(plane => dot(v, typedLit(plane)))

  /** Wide face: (idCol, rproj array&lt;double&gt;) — the reduced vector,
    * ready to feed any ANN/dedup operator in place of the original
    * embedding column.
    */
  def reduce(df: DataFrame, idCol: String, vecCol: String,
      cfg: HyperplaneLSH.Config = config()): DataFrame =
    df.select(col(idCol),
      array(projections(col(vecCol), cfg): _*).as("rproj"))

  /** Melted face: (idCol, plane, proj) — one row per (vector,
    * projection), the audit/gate shape.
    */
  def project(df: DataFrame, idCol: String, vecCol: String,
      cfg: HyperplaneLSH.Config = config()): DataFrame =
    df.select(col(idCol),
        posexplode(array(projections(col(vecCol), cfg): _*))
          .as(Seq("plane", "proj")))
      .select(col(idCol), col("plane"), col("proj"))
}
