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
  *
  * The interleave itself covers 16 bits per dimension; wider domains
  * are quantized first with a data-derived right-shift so relative
  * order is preserved across the full key range (the layout needs
  * relative order, not the full key). The shift derivation is pure
  * integer comparison (a CASE ladder over powers of two) so Spark and
  * the DuckDB oracle agree bit-for-bit — no floating-point log2.
  */
object ZOrder {

  /** 2×16-bit Morton interleave: bit i of x lands at position 2i, bit
    * i of y at 2i+1. Inputs are masked to 16 bits — callers with wider
    * domains quantize first via [[quantShift]] (as [[bucketStats]] and
    * [[cluster]] do), otherwise values 2^16 apart alias to the same
    * z-value.
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

  /** Smallest s ≥ 0 such that (maxVal >> s) < 2^16 — the right-shift
    * that makes a dimension whose maximum is `maxVal` fit the 16-bit
    * interleave without aliasing. Integer-exact (descending CASE
    * ladder over 2^62 … 2^16), so the DuckDB rendering in
    * [[quantShiftSql]] computes the identical value. Null/negative
    * maxima (empty input) fall through to 0.
    */
  def quantShift(maxVal: Column): Column =
    (16 to 62).foldLeft(lit(0)) { (acc, b) =>
      when(maxVal >= lit(1L << b), lit(b - 15)).otherwise(acc)
    }

  /** [[quantShift]] as DuckDB SQL over an integer expression. */
  def quantShiftSql(maxExpr: String): String =
    (62 to 16 by -1)
      .map(b => s"WHEN $maxExpr >= ${1L << b} THEN ${b - 15}")
      .mkString("CASE ", " ", " ELSE 0 END")

  /** shiftright with a non-literal shift amount (the Scala DSL's
    * `shiftright` only takes an Int literal; the SQL function takes
    * any integer expression).
    */
  private def sr(v: Column, s: Column): Column =
    call_function("shiftright", v, s)

  /** Per-dimension quantization shifts for a frame: one tiny (1-row)
    * aggregate, broadcast back onto every row. At 100 TB this is one
    * cheap extra pass over two columns — a max() with map-side
    * combine — not a second shuffle of the data.
    */
  private def withQuantized(df: DataFrame, x: Column, y: Column): DataFrame = {
    val base = df.select(x.cast("bigint").as("__zx"), y.cast("bigint").as("__zy"))
    val shifts = base.agg(
      quantShift(max(col("__zx"))).as("__xs"),
      quantShift(max(col("__zy"))).as("__ys"))
    base.crossJoin(broadcast(shifts))
      .withColumn("__z",
        zvalue16(sr(col("__zx"), col("__xs")), sr(col("__zy"), col("__ys"))))
  }

  /** Cluster a frame for writing: range-partition + sort within
    * partitions by the z-value of the two (quantized) dimensions.
    * This is the write-side layout call — each output file then
    * covers a tight rectangle in (x, y) space and min/max stats prune
    * on both.
    */
  def cluster(df: DataFrame, x: Column, y: Column, numFiles: Int): DataFrame = {
    val shifts = df.agg(
      quantShift(max(x.cast("bigint"))).as("__xs"),
      quantShift(max(y.cast("bigint"))).as("__ys"))
    df.crossJoin(broadcast(shifts))
      .withColumn("__z",
        zvalue16(sr(x.cast("bigint"), col("__xs")), sr(y.cast("bigint"), col("__ys"))))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z", "__xs", "__ys")
  }

  /** Layout audit: bucket rows by z-value prefix and report each
    * bucket's bounding box in the two dimensions plus its row count —
    * the min/max spans a reader would prune against. Tight, disjoint
    * boxes = effective clustering. Dimensions are quantized
    * scale-aware first, so keys more than 2^16 apart can never alias
    * into one bucket no matter the domain (boxes are reported in RAW
    * coordinates).
    */
  def bucketStats(df: DataFrame, x: Column, y: Column,
      prefixShift: Int = 26): DataFrame =
    withQuantized(df, x, y)
      .groupBy(shiftright(col("__z"), prefixShift).as("z_bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("__zx")).as("x_min"), max(col("__zx")).as("x_max"),
        min(col("__zy")).as("y_min"), max(col("__zy")).as("y_max"))
}
