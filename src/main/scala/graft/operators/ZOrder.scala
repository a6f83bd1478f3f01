package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — interleave the bits of two
  * dimension keys so that range-partitioning/sorting by the combined
  * key clusters rows that are close in BOTH dimensions. Written this
  * way, a 100 TB table's parquet row-group min/max statistics prune
  * scans filtered on either dimension (the point of Z-ordering in
  * Delta/Iceberg `OPTIMIZE ZORDER BY`), without maintaining two
  * copies of the data sorted two ways.
  *
  * The z-value is pure bit arithmetic over built-ins (`shiftright`,
  * `bitwise AND`, `shiftleft`, sum) — codegen-friendly, no UDF, and
  * reproducible in the DuckDB oracle with the same `&`/`>>`/`<<`
  * operators.
  */
object ZOrder {

  /** 2×16-bit Morton interleave: bit i of x lands at position 2i, bit
    * i of y at 2i+1. Inputs are masked to 16 bits — callers quantize
    * wider domains first (the layout needs relative order, not the
    * full key).
    */
  def zvalue16(x: Column, y: Column): Column = {
    // widen BEFORE shifting: an INT input would wrap at bit 31 when
    // bit 15 of y lands at position 31
    val (xl, yl) = (x.cast("bigint"), y.cast("bigint"))
    (0 until 16).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(1), 2 * i) +
        shiftleft(shiftright(yl, i).bitwiseAND(1), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** The same interleave for the oracle, as DuckDB SQL over two
    * integer expressions.
    */
  def zvalue16Sql(x: String, y: String): String = {
    val (xl, yl) = (s"CAST($x AS BIGINT)", s"CAST($y AS BIGINT)")
    (0 until 16).map { i =>
      s"((($xl >> $i) & 1) << ${2 * i}) + ((($yl >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")
  }

  /** Cluster a frame for writing: range-partition + sort within
    * partitions by the z-value of the two dimensions. This is the
    * write-side layout call — each output file then covers a tight
    * rectangle in (x, y) space and min/max stats prune on both.
    */
  def cluster(df: DataFrame, x: Column, y: Column, numFiles: Int): DataFrame =
    df.withColumn("__z", zvalue16(x, y))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")

  /** Layout audit: bucket rows by z-value prefix and report each
    * bucket's bounding box in the two dimensions plus its row count —
    * the min/max spans a reader would prune against. Tight, disjoint
    * boxes = effective clustering.
    */
  def bucketStats(df: DataFrame, x: Column, y: Column,
      prefixShift: Int = 26): DataFrame =
    df.select(zvalue16(x, y).as("z"), x.cast("bigint").as("x"),
        y.cast("bigint").as("y"))
      .groupBy(shiftright(col("z"), prefixShift).as("z_bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
}
