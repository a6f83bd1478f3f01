package graft.operators

import graft.SparkTestSession
import graft.expressions.DeletionNeighborhood
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** The FastSS screen theorem, end-to-end: the deletion-neighborhood
  * candidate join + levenshtein verify returns EXACTLY the brute-force
  * lev ≤ d pair set — lossless screen (no pair lost to bucketing),
  * exact verify (no 2d-bound false positive survives). Alphabet is
  * kept tiny so random strings actually collide.
  */
object SymDeleteJoinProps extends Properties("SymDeleteJoin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  private lazy val spark = SparkTestSession.spark

  /** Textbook DP edit distance — the spec's independent referee. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private val genStr: Gen[String] =
    Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
      .map(_.mkString))

  private val genCorpus: Gen[List[String]] = Gen.listOfN(12, genStr)

  property("candidates == brute-force lev<=d pairs, d in {1,2}") =
    forAll(genCorpus, genCorpus, Gen.choose(1, 2)) { (ls, rs, d) =>
      import spark.implicits._
      val left = ls.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("lid", "ltxt")
      val right = rs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("rid", "rtxt")
      val got = SymDeleteJoin
        .candidates(left, right, "lid", "ltxt", "rid", "rtxt", d)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = (for {
        (l, li) <- ls.zipWithIndex
        (r, ri) <- rs.zipWithIndex
        dist = lev(l, r) if dist <= d
      } yield (li.toLong, ri.toLong, dist)).toSet
      got == want
    }

  property("variant cap: precision untouched, candidates a subset") =
    forAll(genCorpus, genCorpus, Gen.choose(1, 2), Gen.choose(1L, 4L)) {
      (ls, rs, d, cap) =>
        import spark.implicits._
        val left = ls.zipWithIndex.map { case (s, i) => (i.toLong, s) }
          .toDF("lid", "ltxt")
        val right = rs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
          .toDF("rid", "rtxt")
        def pairs(mv: Option[Long]) = SymDeleteJoin
          .candidates(left, right, "lid", "ltxt", "rid", "rtxt", d, mv)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
          .toSet
        val capped = pairs(Some(cap))
        val full = pairs(None)
        capped.subsetOf(full) &&
          capped.forall { case (li, ri, dist) =>
            lev(ls(li.toInt), rs(ri.toInt)) == dist && dist <= d
          }
    }

  property("neighborhood is the distinct <=d deletion closure") =
    forAll(genStr, Gen.choose(1, 2)) { (s, d) =>
      val got = DeletionNeighborhood
        .variants(UTF8String.fromString(s), d)
        .toArray[UTF8String](org.apache.spark.sql.types.StringType)
        .map(_.toString).toSet
      def delOne(t: String): Set[String] =
        t.indices.map(i => t.substring(0, i) + t.substring(i + 1)).toSet
      var want = Set(s)
      var frontier = Set(s)
      for (_ <- 1 to d) { frontier = frontier.flatMap(delOne); want ++= frontier }
      got == want
    }
}
