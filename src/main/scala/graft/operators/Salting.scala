package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skew: spread a hot key over `saltBuckets` synthetic
  * sub-keys so no single task owns the whole key.
  *
  * AQE's skew-join splitting handles most join skew automatically at
  * runtime; salting remains the tool for (a) skewed AGGREGATIONS,
  * which AQE does not split, and (b) plans that must be deterministic
  * across runs/engines. Salts here are derived from a hash of carrier
  * columns — never `rand()` — so results are reproducible and
  * retry-safe.
  */
object Salting {

  /** Deterministic salt in [0, saltBuckets) from carrier columns —
    * md5-derived (like every other hash in this repo) so the bucket
    * assignment is reproducible across engines, not just across runs.
    */
  def saltCol(saltBuckets: Int, carriers: Column*): Column =
    pmod(conv(substring(md5(concat_ws("", carriers: _*)), 1, 8), 16, 10)
      .cast("long"), lit(saltBuckets.toLong))

  /** Two-phase skew-safe sum/count aggregation: phase 1 aggregates
    * (key, salt) — splitting a hot key across `saltBuckets` tasks —
    * phase 2 merges the per-salt partials. Both phases map-side
    * combine; the extra shuffle is saltBuckets rows per hot key.
    */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
      saltBuckets: Int, carrier: Column): DataFrame =
    df.groupBy(key.as("key"), saltCol(saltBuckets, carrier).as("__salt"))
      .agg(sum(value).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col("key"))
      .agg(sum(col("__psum")).as("sum"), sum(col("__pcnt")).as("cnt"))

  /** Skew-safe equi-join: the big (skewed) side gets a deterministic
    * salt; the small side is replicated once per salt value (explode of
    * a literal range — size × saltBuckets rows). Join key becomes
    * (key, salt): a hot key's rows land in `saltBuckets` different
    * partitions instead of one.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int, bigCarrier: Column): DataFrame = {
    val saltedBig = big.withColumn("__salt", saltCol(saltBuckets, bigCarrier))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
