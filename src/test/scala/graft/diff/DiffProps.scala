package graft.diff

import graft.SparkTestSession
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}

/** Property-based invariants of the diff core over random tables:
  * random null densities, mixed types (string/int/double), overlapping
  * key sets and random perturbations — the input space the
  * example-based golden tests can't sweep.
  */
object DiffProps extends Properties("DataColDiff") {

  // each property materializes several Spark jobs; 8 random cases per
  // property keeps the suite O(30s) while still sweeping nulls/overlaps
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  private lazy val spark = SparkTestSession.spark

  case class Rec(id: Long, name: Option[String], qty: Option[Int],
      price: Option[Double])

  private val genFields: Gen[(Option[String], Option[Int], Option[Double])] =
    for {
      name <- Gen.option(Gen.oneOf("x", "y", "zz", ""))
      qty <- Gen.option(Gen.choose(0, 5))
      price <- Gen.option(Gen.oneOf(1.5, 2.5, 3.5))
    } yield (name, qty, price)

  /** Two tables over one universe of keys: overlapping subsets, with
    * s2's rows randomly re-generated (≈ random cell edits).
    */
  private val genTables: Gen[(Seq[Rec], Seq[Rec])] = for {
    n <- Gen.choose(1, 25)
    base <- Gen.listOfN(n, genFields)
    edits <- Gen.listOfN(n, genFields)
    editMask <- Gen.listOfN(n, Gen.prob(0.3))
    inS1 <- Gen.listOfN(n, Gen.prob(0.8))
    inS2 <- Gen.listOfN(n, Gen.prob(0.8))
  } yield {
    val recs = base.zipWithIndex.map { case ((a, b, c), i) => Rec(i.toLong, a, b, c) }
    val s2recs = recs.lazyZip(edits).lazyZip(editMask).map {
      case (r, (a, b, c), true) => Rec(r.id, a, b, c)
      case (r, _, false) => r
    }
    (recs.zip(inS1).collect { case (r, true) => r },
      s2recs.zip(inS2).collect { case (r, true) => r })
  }

  private def diffOf(s1: Seq[Rec], s2: Seq[Rec]): DiffResult = {
    import spark.implicits._
    DataColDiff.computeDataframeDiff(s1.toDF(), s2.toDF(), Seq("id"))
      .fold(mm => sys.error(mm.message), identity)
  }

  private def withResult(s1: Seq[Rec], s2: Seq[Rec])(f: DiffResult => Prop): Prop = {
    val res = diffOf(s1, s2)
    try f(res) finally res.diff.unpersist()
  }

  property("self-diff is all NODIFF") = forAll(genTables) { case (s1, _) =>
    withResult(s1, s1) { res =>
      (res.counts.noDiff == s1.size) :| s"counts=${res.counts}" &&
        (res.counts.s1Only == 0 && res.counts.s2Only == 0 && res.counts.diff == 0)
    }
  }

  property("flag classes partition the key universe") =
    forAll(genTables) { case (s1, s2) =>
      withResult(s1, s2) { res =>
        val k1 = s1.map(_.id).toSet
        val k2 = s2.map(_.id).toSet
        (res.counts.s1Only == (k1 diff k2).size) :| "s1_only" &&
          (res.counts.s2Only == (k2 diff k1).size) :| "s2_only" &&
          (res.counts.noDiff + res.counts.diff == (k1 intersect k2).size) :| "matched" &&
          (res.counts.total == (k1 union k2).size) :| "total"
      }
    }

  property("swapping inputs swaps sides") = forAll(genTables) { case (s1, s2) =>
    val fwd = diffOf(s1, s2)
    val bwd = diffOf(s2, s1)
    try {
      val flagsSwap = fwd.counts.s1Only == bwd.counts.s2Only &&
        fwd.counts.s2Only == bwd.counts.s1Only &&
        fwd.counts.noDiff == bwd.counts.noDiff &&
        fwd.counts.diff == bwd.counts.diff
      val fwdStats = fwd.stats.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val bwdStats = bwd.stats.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      flagsSwap :| s"fwd=${fwd.counts} bwd=${bwd.counts}" &&
        (fwdStats == bwdStats) :| "per-column stats symmetric"
    } finally { fwd.diff.unpersist(); bwd.diff.unpersist() }
  }

  property("every reported entry is a genuine difference") =
    forAll(genTables) { case (s1, s2) =>
      withResult(s1, s2) { res =>
        import org.apache.spark.sql.functions._
        val entries = res.diff
          .select(explode(col(DataColDiff.CompColArr)).as("e"))
          .select(col("e.col_name"), col("e.s1_value"), col("e.s2_value"))
          .collect()
        val allDiffer = entries.forall { r =>
          val (a, b) = (Option(r.getString(1)), Option(r.getString(2)))
          a != b
        }
        val validCols = entries.forall(r =>
          Set("name", "qty", "price").contains(r.getString(0)))
        allDiffer :| "s1_value != s2_value (null-safe)" &&
          validCols :| "col_name is a comparison column"
      }
    }
}
