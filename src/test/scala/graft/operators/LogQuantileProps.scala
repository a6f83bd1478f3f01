package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Invariants of the log-bucketed quantile sketch over random corpora:
  * the reported quantile must bracket the true rank value within the
  * 2^−b relative envelope (exactly, per the bucket-edge algebra — not
  * "approximately"), and sketches must merge by addition.
  */
object LogQuantileProps extends Properties("LogQuantile") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkTestSession.spark

  // positive 2-decimal values across the exact (small) and log regions
  private val genVals: Gen[List[Double]] = for {
    n <- Gen.choose(1, 200)
    vs <- Gen.listOfN(n, Gen.oneOf(
      Gen.choose(1, 30),        // identity buckets
      Gen.choose(31, 50000)))   // log buckets
  } yield vs.map(_ / 100.0)

  property("quantile brackets the true rank value: q <= v <= q + max(q/16, 0.01)") =
    forAll(genVals, Gen.choose(1, 6)) { (vals, parts) =>
      import spark.implicits._
      val df = vals.map(("g", _)).toDF("g", "v").repartition(parts)
      val got = LogQuantile.quantiles(df, "g", "v")
        .collect().map(r => r.getAs[String]("p") ->
          (r.getAs[Double]("q"), r.getAs[Long]("n"))).toMap
      val sorted = vals.sorted
      val n = vals.size
      Seq((50, "p50"), (95, "p95"), (99, "p99")).forall { case (num, label) =>
        val rank = (num * n + 99) / 100 // ⌈num·n/100⌉, integers only
        val truth = sorted(rank - 1)
        val (q, gotN) = got(label)
        gotN == n.toLong && q <= truth + 1e-9 &&
          truth <= q + math.max(q / 16.0, 0.01) + 1e-9
      }
    }

  property("sketches merge by addition: sketch(a ++ b) == sum of sketches") =
    forAll(genVals, genVals) { (a, b) =>
      import spark.implicits._
      def sk(vs: List[Double]) =
        LogQuantile.sketch(vs.map(("g", _)).toDF("g", "v"), "g", "v")
          .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      val merged = (sk(a).toSeq ++ sk(b).toSeq)
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      sk(a ++ b) == merged
    }
}
