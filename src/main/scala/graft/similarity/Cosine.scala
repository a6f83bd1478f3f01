package graft.similarity

import graft.expressions.DotProduct
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cosine-similarity expression builders over `array<float>` embedding
  * columns.
  *
  * Dot products run through the native [[graft.expressions.DotProduct]]
  * Catalyst expression — a codegen'd tight loop. (The built-in
  * alternatives both lose: `aggregate(zip_with(...))` lambdas evaluate
  * interpreted, ~20× slower on 64-dim vectors; an unrolled `getItem`
  * chain is codegen'd but needs the dimension at plan-build time and
  * bloats the generated source with the dimension.)
  *
  * Determinism: the fold adds left-to-right, exactly the order the
  * DuckDB oracle's `list_reduce` fold uses, and float→double element
  * casts are exact — so similarity values are bit-identical across
  * engines and can be hash-compared, not just approximately checked.
  *
  * Pure per-row expressions (no UDF): trivially distributed, zero
  * shuffle.
  */
object Cosine {

  /** Left-fold dot product of two equal-length numeric array columns. */
  def dot(a: Column, b: Column): Column = DotProduct(a, b)

  /** Squared L2 norm. */
  def norm2(a: Column): Column = DotProduct(a, a)

  /** Cosine similarity given precomputed squared norms (compute the
    * norm ONCE per vector before a join fans it out).
    */
  def cosineWithNorms(dotAB: Column, norm2A: Column, norm2B: Column): Column =
    dotAB / (sqrt(norm2A) * sqrt(norm2B))

  /** Cosine similarity of two vectors (self-contained form). */
  def cosine(a: Column, b: Column): Column =
    cosineWithNorms(dot(a, b), norm2(a), norm2(b))
}
