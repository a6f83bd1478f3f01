package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cosine-similarity expression builders over `array<float>` embedding
  * columns.
  *
  * Every reduction is an EXPLICIT left-to-right `aggregate` fold in
  * double precision (floats widened first — exact). IEEE adds/muls/
  * sqrt/div are deterministic given operand order, and the DuckDB
  * oracle mirrors the same fold with `list_reduce`, so similarity
  * values are bit-identical across engines — they can be hash-compared,
  * not just approximately checked.
  *
  * Pure per-row expressions (no UDF): codegen-friendly, zero shuffle.
  */
object Cosine {

  /** Widen an array<float> column to array<double>. */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Left-fold dot product of two equal-length array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Squared L2 norm. */
  def norm2(a: Column): Column = dot(a, a)

  /** Cosine similarity given precomputed squared norms (compute the
    * norm ONCE per vector before a join fans it out).
    */
  def cosineWithNorms(dotAB: Column, norm2A: Column, norm2B: Column): Column =
    dotAB / (sqrt(norm2A) * sqrt(norm2B))

  /** Cosine similarity of two vectors (self-contained form). */
  def cosine(a: Column, b: Column): Column =
    cosineWithNorms(dot(a, b), norm2(a), norm2(b))
}
