package graft.operators

import graft.SparkTestSession
import graft.expressions.MisraGries
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based invariants of the Misra-Gries sketch and the
  * two-pass exact heavy-hitters operator, over random skewed corpora,
  * random counter budgets, and random physical partitionings (the
  * repartition forces the partial/merge path — the bound must hold
  * across any merge tree, not just single-buffer streams).
  */
object HeavyHitterProps extends Properties("HeavyHitters") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12).withWorkers(1)

  private lazy val spark = SparkTestSession.spark

  // skewed corpus: few heavy symbols, a long-ish tail — enough distinct
  // items vs k ∈ [1,8] that evictions actually happen
  private val genCorpus: Gen[List[String]] = for {
    n <- Gen.choose(1, 300)
    toks <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.const("hh1"), 5 -> Gen.const("hh2"), 3 -> Gen.const("hh3"),
      4 -> Gen.oneOf((1 to 20).map("tail" + _))))
  } yield toks

  property("MG deficit bound: 0 <= c(x) - sketch(x) <= n/(k+1), any partitioning") =
    forAll(genCorpus, Gen.choose(1, 8), Gen.choose(1, 6)) { (corpus, k, parts) =>
      import spark.implicits._
      val sketch = corpus.toDF("t").repartition(parts)
        .agg(MisraGries(col("t"), k))
        .collect()(0).getAs[Map[String, Long]](0)
      val truth = corpus.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = corpus.size.toLong
      sketch.size <= k &&
        // no invented items or overcounts
        sketch.forall { case (x, est) =>
          truth.contains(x) && est >= 1 && est <= truth(x) } &&
        // deficit ≤ n/(k+1) for EVERY item, absent ⇒ estimate 0
        truth.forall { case (x, c) =>
          (c - sketch.getOrElse(x, 0L)) * (k + 1) <= n }
    }

  property("two-pass exact == naive frequency filter, any partitioning") =
    forAll(genCorpus, Gen.choose(2, 6), Gen.choose(1, 6)) { (corpus, denom, parts) =>
      import spark.implicits._
      val items = corpus.toDF("t").repartition(parts)
      val got = HeavyHitters.exact(items, "t", denom, k = denom)
        .select("t", "cnt").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val n = corpus.size.toLong
      val want = corpus.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * denom > n }.toMap
      got == want
    }

  property("per-group two-pass exact == naive per-group filter, any partitioning") =
    forAll(genCorpus, genCorpus, Gen.choose(2, 6), Gen.choose(1, 6)) {
      (ca, cb, denom, parts) =>
        import spark.implicits._
        val rows = ca.map(("ga", _)) ++ cb.map(("gb", _))
        val items = rows.toDF("g", "t").repartition(parts)
        val got = HeavyHitters.exactPerGroup(items, "g", "t", denom, k = denom)
          .select("g", "t", "cnt").collect()
          .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
        val want = rows.groupBy(identity).view.mapValues(_.size.toLong)
          .filter { case ((g, _), c) =>
            val n = (if (g == "ga") ca else cb).size.toLong
            c * denom > n
          }.toMap
        got == want
    }

  property("null items are ignored; all-null input yields an empty sketch") =
    forAll(Gen.choose(1, 5)) { k =>
      import spark.implicits._
      val sk = Seq[Option[String]](None, Some("a"), None, Some("a"), Some("b"))
        .toDF("t").repartition(2)
        .agg(MisraGries(col("t"), k)).collect()(0).getAs[Map[String, Long]](0)
      val empty = Seq[Option[String]](None, None).toDF("t")
        .agg(MisraGries(col("t"), k)).collect()(0).getAs[Map[String, Long]](0)
      // 3 non-null inputs: "a" (count 2) must survive any k >= 1 sketch
      // (deficit ≤ 3/(k+1) ≤ 1 < 2) — and nulls must not have shifted n
      sk.getOrElse("a", 0L) >= 1 && empty.isEmpty
    }
}
