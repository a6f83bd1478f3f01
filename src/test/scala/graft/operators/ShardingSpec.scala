package graft.operators

import graft.SparkTestSession
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ShardingSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val ids = (0L until 1000L).toDF("id")

  test("assignment is deterministic, in range, and salt-sensitive") {
    val a = Sharding.withShard(ids, "id", 8).orderBy("id")
      .collect().map(_.getLong(1))
    val b = Sharding.withShard(ids, "id", 8).orderBy("id")
      .collect().map(_.getLong(1))
    assert(a.toSeq === b.toSeq)
    assert(a.forall(s => s >= 0 && s < 8))
    val other = Sharding.withShard(ids, "id", 8, salt = "v2").orderBy("id")
      .collect().map(_.getLong(1))
    assert(a.toSeq !== other.toSeq) // independent layout per salt
  }

  test("shards are roughly balanced (md5 spreads sequential ids)") {
    val counts = Sharding.withShard(ids, "id", 8)
      .groupBy("shard").count().collect().map(_.getLong(1))
    assert(counts.length === 8)
    // 1000 ids over 8 shards: expect 125 each; allow generous slack
    assert(counts.forall(c => c > 75 && c < 175), counts.toSeq)
  }

  test("writeShards round-trips: shard=N dirs, stable contents, no loss") {
    val dir = Files.createTempDirectory("graft-shards").toString
    val df = (0L until 300L).map(i => (i, s"doc-$i")).toDF("id", "text")
    Sharding.writeShards(df, "id", 4, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === 300L)
    // partition column materializes the same assignment withShard computes
    val want = Sharding.withShard(df, "id", 4)
      .select("id", "shard").as[(Long, Long)].collect().toMap
    val got = back.select(col("id"), col("shard").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(got === want)
    // one file per shard dir (tasksPerShard = 1)
    val d = new java.io.File(dir)
    val shardDirs = d.listFiles().filter(_.getName.startsWith("shard="))
    assert(shardDirs.length === 4)
    // second write is byte-identical per shard (stable layout)
    val dir2 = Files.createTempDirectory("graft-shards2").toString
    Sharding.writeShards(df, "id", 4, dir2)
    def bytes(root: String, shard: String) = {
      val f = new java.io.File(s"$root/$shard").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.readAllBytes(f.toPath)
    }
    for (s <- shardDirs.map(_.getName))
      assert(java.util.Arrays.equals(bytes(dir, s), bytes(dir2, s)),
        s"shard $s not byte-stable")
  }

  test("tasksPerShard splits a shard into multiple stable files") {
    val dir = Files.createTempDirectory("graft-shards-split").toString
    val df = (0L until 400L).map(i => (i, s"d$i")).toDF("id", "text")
    Sharding.writeShards(df, "id", 2, dir, tasksPerShard = 3)
    val back = spark.read.parquet(dir)
    assert(back.count() === 400L)
    val want = Sharding.withShard(df, "id", 2)
      .select("id", "shard").as[(Long, Long)].collect().toMap
    val got = back.select(col("id"), col("shard").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(got === want)
  }
}
