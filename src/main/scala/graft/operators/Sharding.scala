package graft.operators

import graft.text.TextFeatures.hash32
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic training-shard assignment and writer — the final step
  * of a curation pipeline: spread the corpus across a fixed number of
  * shards, stably, so that (a) a re-run (or a task retry) produces the
  * IDENTICAL shard layout, (b) downstream loaders can address shards by
  * number, and (c) adjacent documents (same crawl, same source) land in
  * different shards — md5 of the id is the shuffle.
  *
  * `rand()`- or `monotonically_increasing_id`-based sharding breaks all
  * three: assignments change per run and per retry. Here the shard is a
  * pure function of the row id (same md5→integer mapping the sampling /
  * salting operators use, [[graft.text.TextFeatures.hash32]]), so the
  * oracle can reproduce the exact assignment.
  */
object Sharding {

  /** Shard in [0, nShards) as a pure function of `id`. A different
    * `salt` draws an independent layout.
    */
  def shardColumn(id: Column, nShards: Int, salt: String = "shard"): Column = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    pmod(hash32(concat(lit(s"$salt:"), id.cast("string"))), lit(nShards.toLong))
  }

  def withShard(df: DataFrame, idCol: String, nShards: Int,
      salt: String = "shard"): DataFrame =
    df.withColumn("shard", shardColumn(col(idCol), nShards, salt))

  /** Write the corpus as `shard=N/` parquet directories: one shuffle by
    * shard, rows sorted by id within each file so shard CONTENTS are
    * byte-stable across runs. Raising `tasksPerShard` subdivides each
    * shard's rows by a second deterministic hash so a hot shard's write
    * work spreads over more tasks; which (shard, split) groups share a
    * physical partition is Spark's hash placement — deterministic for a
    * fixed partition count, but the file count per directory is not
    * exactly tasksPerShard. What IS guaranteed: the row→shard mapping,
    * the row→split mapping, and in-file ordering.
    */
  def writeShards(df: DataFrame, idCol: String, nShards: Int, path: String,
      salt: String = "shard", tasksPerShard: Int = 1): Unit = {
    val sharded = withShard(df, idCol, nShards, salt)
    val parts =
      if (tasksPerShard <= 1) sharded.repartition(nShards, col("shard"))
      else sharded.repartition(nShards * tasksPerShard, col("shard"),
        pmod(hash32(concat(lit(s"$salt-split:"), col(idCol).cast("string"))),
          lit(tasksPerShard.toLong)))
    parts.sortWithinPartitions(idCol)
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }
}
