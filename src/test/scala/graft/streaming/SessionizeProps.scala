package graft.streaming

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Pure properties of the sessionization merge-insert — no Spark
  * needed, so these sweep thousands of cases: the fold must be
  * insertion-order-insensitive (the whole basis of out-of-order
  * safety) and must agree with the naive sort-then-split-at-gaps
  * batch formulation.
  */
object SessionizeProps extends Properties("Sessionize.mergeInsert") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(500)

  private val gapMs = 10L

  /** Reference: sort, split where the gap is >= gapMs (strict fusion —
    * matches session_window's half-open windows).
    */
  private def naive(ts: Seq[Long]): List[Sessionize.Open] = {
    val sorted = ts.sorted
    sorted.foldLeft(List.empty[Sessionize.Open]) {
      case (acc :+ last, t) if t - last.end < gapMs =>
        acc :+ Sessionize.Open(last.start, math.max(last.end, t), last.n + 1)
      case (acc, t) => acc :+ Sessionize.Open(t, t, 1)
    }
  }

  private val genTimes: Gen[List[Long]] =
    Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, Gen.choose(0L, 300L)))

  property("any insertion order == sorted gaps-and-islands") =
    forAll(genTimes) { ts =>
      val folded = ts.foldLeft(List.empty[Sessionize.Open])(
        (acc, t) => Sessionize.mergeInsert(acc, t, gapMs))
      folded == naive(ts)
    }

  property("result is sorted, disjoint, gap-separated, count-preserving") =
    forAll(genTimes) { ts =>
      val r = ts.foldLeft(List.empty[Sessionize.Open])(
        (acc, t) => Sessionize.mergeInsert(acc, t, gapMs))
      val sortedDisjoint = r.zip(r.drop(1)).forall { case (a, b) =>
        a.end < b.start && b.start - a.end >= gapMs
      }
      sortedDisjoint && r.map(_.n).sum == ts.length &&
        r.forall(s => s.start <= s.end)
    }
}
