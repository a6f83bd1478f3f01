package graft.tables

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property invariants of [[Maintenance.sweep]] against the naive
  * point-cover reference: a probe value's cover depth exceeds the
  * threshold iff the value falls inside some reported hot range, and
  * each reported peak equals the true maximum cover inside its range —
  * over random interval sets, duplicate endpoints, point intervals,
  * and adjacent stacks (the shapes the endpoint-order rules exist for).
  */
object MaintenanceProps extends Properties("MaintenanceSweep") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200).withWorkers(1)

  private val genIntervals: Gen[List[(Long, Long)]] =
    Gen.choose(1, 25).flatMap(n => Gen.listOfN(n, for {
      a <- Gen.choose(0L, 40L)
      w <- Gen.choose(0L, 15L)
    } yield (a, a + w)))

  private def cover(ivs: List[(Long, Long)], v: Long): Int =
    ivs.count { case (lo, hi) => lo <= v && v <= hi }

  property("hot ranges == exact over-threshold cover point set") =
    forAll(genIntervals, Gen.choose(1, 6)) { (ivs, thr) =>
      val stats = ivs.map { case (lo, hi) =>
        TxLog.ColStats("long", lo.toString, hi.toString) }
      val ranges = Maintenance.sweep("k", stats, thr)
        .map(r => (r.lo.toLong, r.hi.toLong, r.depth))
      // probe every endpoint and the gaps just outside them
      val probes = ivs.flatMap { case (a, b) =>
        Seq(a - 1, a, a + 1, (a + b) / 2, b - 1, b, b + 1) }.distinct
      // SHARP biconditional: depth only rises at starts and inclusive
      // ends process after same-value starts, so a range holds exactly
      // the over-threshold cover points — no dips, no slack
      probes.forall { v =>
        (cover(ivs, v) > thr) ==
          ranges.exists { case (lo, hi, _) => lo <= v && v <= hi }
      } && ranges.forall { case (lo, hi, depth) =>
        // the reported peak is the true max cover, attained at some
        // interval start inside the range (all starts are probes)
        val inside = probes.filter(v => lo <= v && v <= hi)
        inside.nonEmpty && inside.map(cover(ivs, _)).max == depth
      }
    }

  property("quiet iff no point exceeds the threshold") =
    forAll(genIntervals, Gen.choose(1, 6)) { (ivs, thr) =>
      val stats = ivs.map { case (lo, hi) =>
        TxLog.ColStats("long", lo.toString, hi.toString) }
      val ranges = Maintenance.sweep("k", stats, thr)
      val probes = ivs.flatMap { case (a, b) => Seq(a, b, (a + b) / 2) }
      ranges.isEmpty == probes.forall(cover(ivs, _) <= thr)
    }
}
