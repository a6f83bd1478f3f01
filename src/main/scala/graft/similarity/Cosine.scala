package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cosine-similarity expression builders over `array<float>` embedding
  * columns.
  *
  * Dot products are UNROLLED over the (fixed, known) embedding
  * dimension into a chain of `GetArrayItem`/multiply/add expressions.
  * Those are plain codegen'd Catalyst ops, so the whole reduction stays
  * inside whole-stage codegen. The lambda alternative
  * (`aggregate(zip_with(...))`) evaluates interpreted — measured ~20×
  * slower on the 64-dim embeddings table, and it was the dominant cost
  * of every kNN/ANN query.
  *
  * Determinism: the unrolled fold `(((0.0 + t0) + t1) + ...)` adds in
  * exactly the order the DuckDB oracle's `list_reduce` fold uses, and
  * float→double element casts are exact, so similarity values are
  * bit-identical across engines — they can be hash-compared, not just
  * approximately checked.
  *
  * Pure per-row expressions (no UDF): trivially distributed, zero
  * shuffle.
  */
object Cosine {

  /** Embedding dimension of a vector column, read from one row (a
    * pruned single-row scan — O(1) regardless of corpus size). All
    * vectors in a corpus share one dimension by construction; a
    * mismatched row surfaces as a null dot product downstream.
    */
  def dimOf(vectors: DataFrame, vecCol: String): Int =
    vectors.select(size(col(vecCol))).head.getInt(0)

  /** Left-fold dot product of two fixed-`dim` array<float|double>
    * columns, unrolled for codegen.
    */
  def dot(a: Column, b: Column, dim: Int): Column =
    (0 until dim)
      .map(i => a.getItem(i).cast("double") * b.getItem(i).cast("double"))
      .foldLeft(lit(0.0))(_ + _)

  /** Squared L2 norm. */
  def norm2(a: Column, dim: Int): Column = dot(a, a, dim)

  /** Cosine similarity given precomputed squared norms (compute the
    * norm ONCE per vector before a join fans it out).
    */
  def cosineWithNorms(dotAB: Column, norm2A: Column, norm2B: Column): Column =
    dotAB / (sqrt(norm2A) * sqrt(norm2B))

  /** Cosine similarity of two vectors (self-contained form). */
  def cosine(a: Column, b: Column, dim: Int): Column =
    cosineWithNorms(dot(a, b, dim), norm2(a, dim), norm2(b, dim))
}
