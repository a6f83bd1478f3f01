package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Temperature-weighted mix sampling: data-derived rates must be
  * deterministic (partitioning-invariant) and follow the n^(1/T)
  * rebalancing semantics.
  */
class SamplingSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  // source "big": 16 rows, source "small": 4 rows
  private val docs = ((0 until 16).map(i => (i.toLong, "big")) ++
    (16 until 20).map(i => (i.toLong, "small"))).toDF("doc_id", "source")

  private def kept(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("T=1 reduces to a flat sample: every stratum keeps targetFrac") {
    // weights ∝ n_s, so rate_s = targetFrac for ALL strata — identical
    // row set to the plain coordinate filter under the same salt
    val t1 = kept(Sampling.temperatureSample(docs, "doc_id", "source",
      temperature = 1.0, targetFrac = 0.5))
    val flat = kept(Sampling.sample(docs, "doc_id", 0.5, salt = "temp"))
    assert(t1 === flat)
  }

  test("T=2 upsamples the small source relative to its size") {
    // n=16 vs 4 → weights 4 vs 2 → rates 5/12·2f vs 5/3·f: the small
    // stratum's keep RATE is 2× the big one's (sqrt flattening)
    val out = Sampling.temperatureSample(docs, "doc_id", "source",
        temperature = 2.0, targetFrac = 0.5)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact rates: big f·5/6 ≈ 0.417, small f·5/3 ≈ 0.833 — realized
    // counts vary with the md5 draw, but the small source must keep a
    // strictly larger FRACTION than the big one
    val bigFrac = out.getOrElse("big", 0L).toDouble / 16
    val smallFrac = out.getOrElse("small", 0L).toDouble / 4
    assert(smallFrac > bigFrac)
  }

  test("rates cap at 1: no stratum is over-asked") {
    // targetFrac=1 pushes the small stratum's raw rate to 5/3 → capped
    // at 1 → every small row kept
    val out = Sampling.temperatureSample(docs, "doc_id", "source",
      temperature = 2.0, targetFrac = 1.0)
    assert(out.filter(col("source") === "small").count() === 4)
  }

  test("kept row set is partitioning-invariant (sorted weight fold)") {
    val a = kept(Sampling.temperatureSample(docs.repartition(1),
      "doc_id", "source", 2.0, 0.5))
    val b = kept(Sampling.temperatureSample(docs.repartition(16),
      "doc_id", "source", 2.0, 0.5))
    assert(a === b)
    assert(a.nonEmpty)
  }

  private def copies(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.select("doc_id", "epoch_copy").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap

  test("epochMix: integer epochs replicate exactly; copies are 0..n-1") {
    val out = copies(Sampling.epochMix(docs, "doc_id", "source",
      Map("big" -> 3.0, "small" -> 1.0)))
    (0 until 16).foreach(i => assert(out(i.toLong) === Seq(0L, 1L, 2L)))
    (16 until 20).foreach(i => assert(out(i.toLong) === Seq(0L)))
  }

  test("epochMix: fractional part is a deterministic per-row extra copy") {
    val out = copies(Sampling.epochMix(docs, "doc_id", "source",
      Map("big" -> 1.5), defaultEpochs = 1.0))
    // every big row at least once, the md5-selected subset exactly twice
    val twice = out.filter { case (id, c) => id < 16 && c.size == 2 }.keySet
    assert(out.filter(_._1 < 16).values.forall(c => c == Seq(0L) || c == Seq(0L, 1L)))
    assert(twice.nonEmpty && twice.size < 16)
    // same subset the sampler itself selects at rate 0.5 under the salt
    assert(twice === kept(Sampling.sample(
      docs.filter(col("source") === "big"), "doc_id", 0.5, "epoch")))
  }

  test("epochMix: epochs below 1 downsample, zero drops the stratum") {
    val out = copies(Sampling.epochMix(docs, "doc_id", "source",
      Map("big" -> 0.5, "small" -> 0.0)))
    assert(out.keySet.forall(_ < 16))
    assert(out.size < 16 && out.nonEmpty)
    assert(out.values.forall(_ == Seq(0L)))
  }

  test("epochMix: partitioning-invariant") {
    val a = copies(Sampling.epochMix(docs, "doc_id", "source",
      Map("big" -> 2.5, "small" -> 1.5)))
    val b = copies(Sampling.epochMix(docs.repartition(7), "doc_id", "source",
      Map("big" -> 2.5, "small" -> 1.5)))
    assert(a === b)
  }

  test("weightedSample: degenerate weights; sharpening nests per salt") {
    import spark.implicits._
    val rows = (1L to 400L).map(i =>
      (i, if (i % 4 == 0) 0.0 else if (i % 4 == 1) 1.0 else 0.6))
      .toDF("doc_id", "w")
    def ids(power: Int) =
      Sampling.weightedSample(rows, "doc_id", "w", power, "s")
        .collect().map(_.getLong(0)).toSet
    val p1 = ids(1); val p2 = ids(2)
    // weight 0 never keeps, weight 1 always keeps
    assert(rows.filter("w = 0.0").count() > 0)
    assert(p1.intersect((4L to 400L by 4).toSet).isEmpty)
    assert((1L to 400L by 4).toSet.subsetOf(p1))
    // squaring only LOWERS thresholds -> power-2 keeps a subset
    assert(p2.subsetOf(p1) && p2.size < p1.size)
    // mid-weight rows keep at roughly w^power rates
    val mid = (1L to 400L).filter(i => i % 4 == 2 || i % 4 == 3).toSet
    val k1 = p1.intersect(mid).size / 200.0
    val k2 = p2.intersect(mid).size / 200.0
    assert(math.abs(k1 - 0.6) < 0.15 && math.abs(k2 - 0.36) < 0.15)
  }
}
