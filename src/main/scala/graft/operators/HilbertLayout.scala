package graft.operators

import graft.expressions.HilbertIndex
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hilbert-curve data layout — [[ZOrder]]'s sibling with strictly
  * better locality: consecutive curve positions are always ADJACENT
  * grid cells, so a contiguous run of the sort key (one output file)
  * covers one connected rectangle-ish region, where the Z-curve's
  * periodic diagonal jumps hand a file two distant rectangles and a
  * uselessly wide min/max bounding box on both dimensions.
  *
  * Same quantization contract as ZOrder ([[ZOrder.quantShift]] — the
  * shared scale-aware right-shift, one tiny broadcast aggregate);
  * the index itself is the codegen'd
  * [[graft.expressions.HilbertIndex]] walk.
  */
object HilbertLayout {

  private def sr(v: Column, s: Column): Column =
    call_function("shiftright", v, s)

  private def withQuantized(df: DataFrame, x: Column, y: Column): DataFrame = {
    val base = df.select(x.cast("bigint").as("__hx"),
      y.cast("bigint").as("__hy"))
    val shifts = base.agg(
      ZOrder.quantShift(max(col("__hx"))).as("__xs"),
      ZOrder.quantShift(max(col("__hy"))).as("__ys"))
    base.crossJoin(broadcast(shifts))
      .withColumn("__h",
        HilbertIndex(sr(col("__hx"), col("__xs")), sr(col("__hy"), col("__ys"))))
  }

  /** Range-partition + sort by the Hilbert index of the two
    * (quantized) dimensions — the write-side layout call, like
    * [[ZOrder.cluster]].
    */
  def cluster(df: DataFrame, x: Column, y: Column, numFiles: Int): DataFrame = {
    val shifts = df.agg(
      ZOrder.quantShift(max(x.cast("bigint"))).as("__xs"),
      ZOrder.quantShift(max(y.cast("bigint"))).as("__ys"))
    df.crossJoin(broadcast(shifts))
      .withColumn("__h",
        HilbertIndex(sr(x.cast("bigint"), col("__xs")),
          sr(y.cast("bigint"), col("__ys"))))
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h", "__xs", "__ys")
  }

  /** Layout audit: bucket rows by Hilbert-index prefix and report each
    * bucket's bounding box + row count in RAW coordinates — the
    * [[ZOrder.bucketStats]] contract on the better curve.
    */
  def bucketStats(df: DataFrame, x: Column, y: Column,
      prefixShift: Int = 26): DataFrame =
    withQuantized(df, x, y)
      .groupBy(shiftright(col("__h"), prefixShift).as("h_bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("__hx")).as("x_min"), max(col("__hx")).as("x_max"),
        min(col("__hy")).as("y_min"), max(col("__hy")).as("y_max"))
}
