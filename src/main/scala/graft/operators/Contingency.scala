package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contingency-table independence audit between two categorical
  * columns — the data-quality screen for "are these supposed to be
  * unrelated?": a training mix whose `source` predicts `lang` leaks
  * sampling bias into every downstream split, and a feature column
  * that predicts the label column this strongly is leakage. Reports
  * the observed count, the independence expectation and the χ²
  * contribution PER CELL, so the consumer both sums a test statistic
  * and sees WHICH cells drive it (the actionable part).
  *
  * Determinism: the statistic is left unsummed deliberately —
  * cell contributions are each ONE IEEE division of exact integers
  * ((o·N − r·c)² / (r·c·N), with the squared numerator kept inside
  * double's 2^53 integer range for any N below ~9·10^7 cell mass),
  * so the frame hash-verifies; a summed χ² would depend on float
  * aggregation order. Expected = r·c/N, also one division.
  *
  * Shape: one (a, b) count aggregate; marginals derive from it
  * (grouped re-aggregates of the SMALL cell frame, never a second
  * scan); the 1-row total broadcasts.
  */
object Contingency {

  /** (a, b, observed, expected, contrib) per occupied cell. */
  def table(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
      .persist() // three derived aggregates; callers clearCache
    val ra = cells.groupBy("a").agg(sum("o").as("r"))
    val cb = cells.groupBy("b").agg(sum("o").as("c"))
    val n = cells.agg(sum("o").as("n"))
    cells.join(ra, "a").join(cb, "b").crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("o").as("observed"),
        ((col("r") * col("c")).cast("double") / col("n")).as("expected"),
        (((col("o") * col("n") - col("r") * col("c")).cast("double") *
          (col("o") * col("n") - col("r") * col("c")).cast("double")) /
          (col("r") * col("c") * col("n")).cast("double")).as("contrib"))
  }
}
