package graft.dedup

import graft.SparkTestSession
import graft.operators.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClustersSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("connected components: transitivity across chains, isolated pairs") {
    // 1-2-3-4 is a CHAIN (1~4 never directly paired), {10,11} separate
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val comps = Clusters.connectedComponents(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("dedupByClusters keeps the min id per cluster plus unpaired docs") {
    val docs = Seq(1L, 2L, 3L, 4L, 10L, 11L, 99L).toDF("doc_id")
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val kept = Clusters.dedupByClusters(docs, "doc_id", pairs, "doc_a", "doc_b")
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq === Seq(1L, 10L, 99L))
  }

  test("appendComponents(cc(a), b) equals cc(a ++ b) across merge shapes") {
    // standing: clusters {1,2,3}, {10,11}, {20,21}; the batch (b)
    // bridges two standing clusters (11-20), extends one with a new
    // node (3-30), opens a disjoint new chain (40-41-42), and adds a
    // pair internal to an existing cluster (1-3, a no-op)
    val a = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val b = Seq((11L, 20L), (3L, 30L), (40L, 41L), (41L, 42L), (1L, 3L))
      .toDF("doc_a", "doc_b")
    val standing = Clusters.connectedComponents(a, "doc_a", "doc_b")
    val got = Clusters.appendComponents(standing, b, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Clusters
      .connectedComponents(a.unionByName(b), "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    // shape sanity: the bridge merged {10,11} with {20,21}, the new
    // node joined cluster 1, and the chain labeled by its own minimum
    assert(got(21L) === 10L && got(30L) === 1L && got(42L) === 40L)
    spark.catalog.clearCache()
  }

  test("appendComponents with only internal pairs is the identity") {
    val a = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val standing = Clusters.connectedComponents(a, "doc_a", "doc_b")
    val before = standing.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Clusters.appendComponents(standing,
        Seq((1L, 3L)).toDF("doc_a", "doc_b"), "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === before)
    spark.catalog.clearCache()
  }

  test("two-star CC solves a 300-node CHAIN within its O(log n) round budget") {
    // diameter 300: min-label propagation would need 300 rounds; the
    // large-star/small-star rewrite must finish well inside maxIter=25
    val chain = (0L until 299L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val comps = Clusters
      .connectedComponentsTwoStar(chain, "doc_a", "doc_b", maxIter = 25)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(comps.length === 300)
    assert(comps.forall(_._2 == 0L), "all chain nodes must join component 0")
  }

  test("components on the real minhash pair graph cover exactly the paired docs") {
    val pairs = MinHashLSH.nearDuplicatePairs(
        graft.queries.Tables.load(spark, "/root/testdata/sf0.001", "documents"),
        "doc_id", "text")
      .select("doc_a", "doc_b").persist()
    val nodes = pairs.select(col("doc_a").as("id"))
      .unionByName(pairs.select(col("doc_b").as("id")))
      .distinct().collect().map(_.getLong(0)).toSet
    val comps = Clusters.connectedComponents(pairs, "doc_a", "doc_b").collect()
    assert(comps.map(_.getLong(0)).toSet === nodes)
    // every component label is itself a member node, and is the min of
    // its members
    val byComp = comps.groupBy(_.getLong(1))
    byComp.foreach { case (c, members) =>
      assert(members.map(_.getLong(0)).min === c)
    }
    pairs.unpersist()
  }

  test("deterministic sampling: stable row set, nested rates, stratified") {
    val docs = graft.queries.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val s1 = ids(Sampling.sample(docs, "doc_id", 0.2))
    val s2 = ids(Sampling.sample(docs, "doc_id", 0.2))
    assert(s1 === s2)                       // run-to-run deterministic
    assert(s1.nonEmpty && s1.size < 500)
    val bigger = ids(Sampling.sample(docs, "doc_id", 0.5))
    assert(s1.subsetOf(bigger))             // nested: rate up only adds
    assert(ids(Sampling.sample(docs, "doc_id", 0.2, salt = "other")) !== s1)

    val strat = Sampling.stratifiedSample(docs, "doc_id", "source",
      Map("src0" -> 1.0), defaultRate = 0.0)
    val bySource = strat.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource.keySet === Set("src0")) // default 0 drops the rest
    assert(bySource("src0") === docs.filter($"source" === "src0").count())

    // train/eval split: total partition, stable, disjoint by construction
    val tagged = docs.select($"doc_id",
      Sampling.splitColumn($"doc_id", 0.2).as("split"))
    val byTag = tagged.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTag.values.sum === docs.count())
    assert(byTag.keySet === Set("train", "eval"))
    assert(byTag("eval") > 0 && byTag("train") > byTag("eval"))
  }
}
