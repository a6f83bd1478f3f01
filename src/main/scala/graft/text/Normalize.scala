package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text normalization — the cleaning pass a corpus runs BEFORE hashing
  * or deduplication, so near-identical renderings ("Hello,  World!" vs
  * "hello world") collapse to one canonical form.
  *
  * Pure per-row projections over built-in regexp functions: zero
  * shuffle, scan-speed at any scale. Patterns stick to character
  * classes with identical semantics in Java regex (Spark) and RE2
  * (DuckDB oracle), so canonical forms — and the md5 keys derived from
  * them — are bit-identical across engines.
  */
object Normalize {

  /** Lowercase, strip everything but letters/digits/spaces, collapse
    * whitespace runs, trim. The canonical form for exact dedup.
    */
  def canonical(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** md5 of the canonical form — the dedup key that ignores case,
    * punctuation and spacing differences.
    */
  def canonicalKey(text: Column): Column = md5(canonical(text))
}
