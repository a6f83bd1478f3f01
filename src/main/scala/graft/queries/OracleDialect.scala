package graft.queries

/** Helpers for GENERATING the DuckDB oracle SQL that must reproduce the
  * engine's md5-derived integers bit-for-bit. Spark-side code uses
  * `conv(hex, 16, 10)`; DuckDB has no conv, so the oracle unrolls the
  * digit arithmetic explicitly.
  */
private[queries] object OracleDialect {

  /** Σ digit_i · 16^(digits-i) over the first `digits` chars of the
    * (lowercase-hex) string expression — equals
    * [[graft.text.TextFeatures.hexPrefixToLong]].
    */
  def hexPrefixToLong(sqlExpr: String, digits: Int): String =
    (1 to digits).map { i =>
      val scale = 1L << (4 * (digits - i))
      s"(instr('0123456789abcdef', substr($sqlExpr, $i, 1)) - 1) * $scale"
    }.mkString(" + ")

  /** `['a', 'b', ...]` list literal. */
  def stringList(items: Seq[String]): String =
    items.map(s => s"'$s'").mkString("[", ", ", "]")

  /** Left-fold dot product over two DOUBLE[] expressions — mirrors
    * [[graft.similarity.Cosine.dot]]'s `aggregate` fold element order,
    * so the double comes out bit-identical.
    */
  def foldDot(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, [$a[i] * $b[i] " +
      s"for i in generate_series(1, len($a))]), (x, y) -> x + y)"
}
