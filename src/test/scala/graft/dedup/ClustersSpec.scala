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
