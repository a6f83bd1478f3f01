package graft.operators

import graft.SparkTestSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}

/** Funnel invariants against a naive driver-side replica over random
  * event streams: stage counts, monotone shrinkage, and the Bloom-free
  * conversion arithmetic.
  */
object FunnelProps extends Properties("Funnel") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  private lazy val spark = SparkTestSession.spark

  private val steps = Seq("s1", "s2", "s3")

  private val genEvent: Gen[(String, String, Long)] = for {
    u <- Gen.choose(1, 6).map(i => s"u$i")
    t <- Gen.oneOf("s1", "s2", "s3", "other")
    ts <- Gen.choose(1L, 40L)
  } yield (u, t, ts)

  private val genEvents: Gen[List[(String, String, Long)]] =
    Gen.choose(1, 60).flatMap(n => Gen.listOfN(n, genEvent))

  /** The definition, executed literally: stage i's first completion is
    * the min ts of type steps(i) strictly after stage i-1's.
    */
  private def naive(events: Seq[(String, String, Long)]): Seq[Long] = {
    val byUser = events.groupBy(_._1)
    val times = byUser.values.map { evs =>
      steps.foldLeft(Vector.empty[Option[Long]]) { (acc, step) =>
        val floor = if (acc.isEmpty) Some(Long.MinValue) else acc.last
        acc :+ floor.flatMap(f =>
          evs.filter(e => e._2 == step && e._3 > f).map(_._3).minOption)
      }
    }.toSeq
    steps.indices.map(i => times.count(_(i).isDefined).toLong)
  }

  property("stage counts == naive definition; funnel only narrows") =
    forAll(genEvents) { events =>
      import spark.implicits._
      val got = Funnel.stages(events.toDF("u", "t", "ts"), "u", "t", "ts",
          steps)
        .orderBy("step").collect()
        .map(r => (r.getLong(2), r.getDouble(3)))
      val counts = got.map(_._1).toSeq
      val want = naive(events)
      val users = events.map(_._1).distinct.length.toLong
      val denoms = users +: counts.dropRight(1)
      val convOk = got.zip(denoms).forall { case ((n, conv), d) =>
        if (d == 0) conv == 0.0 else conv == n.toDouble / d
      }
      val monotone = counts.zip(counts.drop(1)).forall { case (a, b) => b <= a }
      (counts == want) :| s"counts $counts != $want" &&
        monotone :| "stage counts must be non-increasing" &&
        convOk :| "conv must be n / previous stage"
    }
}
