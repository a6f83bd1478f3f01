package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact deduplication with keep-best-row semantics.
  *
  * The 100 TB-minded detail: rows are grouped by a fixed-width HASH of
  * the dedup key, not the key itself — deduping documents by full text
  * would shuffle every byte of the corpus; deduping by `md5(text)`
  * shuffles 32 bytes per row. (md5 collisions are ~2^-64 at any
  * realistic corpus size; callers who can't accept that can pass the
  * raw column as `groupKey`.)
  */
object ExactDedup {

  /** Keep exactly one row per `groupKey`, the first under `order`
    * (e.g. lowest id, newest timestamp). One shuffle on the group key;
    * the per-partition sort is the standard window top-1.
    */
  def keepBest(df: DataFrame, groupKey: Column, order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(groupKey).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Dedup a corpus on the md5 of a text column, keeping the row with
    * the smallest `idCol` (deterministic tie-break: the id is unique).
    */
  def byTextHash(df: DataFrame, textCol: String, idCol: String): DataFrame =
    keepBest(df, md5(col(textCol)), Seq(col(idCol)))
}
