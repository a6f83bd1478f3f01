package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Randomized Count-Min invariants: one-sided error under real
  * collision pressure (a deliberately tiny grid), and cell-wise-sum
  * mergeability across arbitrary stream splits — the property that
  * makes a standing sketch table fold in delta batches
  * (`q_agg_upsert`-style) without rescanning history.
  */
object CountMinProps extends Properties("CountMin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkTestSession.spark

  private def items(xs: Seq[String]): DataFrame = {
    import spark.implicits._
    xs.toDF("item")
  }

  private val genStream: Gen[List[String]] =
    Gen.listOf(Gen.oneOf("a", "b", "c", "dog", "cat", "x1", "x2"))

  property("estimate never falls below the exact count") =
    forAll(genStream) { stream =>
      stream.isEmpty || {
        // tiny sketch, so collisions actually happen
        val cfg = CountMin.Config(depth = 2, width = 4)
        val sk = CountMin.cells(items(stream), "item", cfg)
        val est = CountMin.estimates(sk, items(stream.distinct), "item", cfg)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val exact = stream.groupBy(identity).view.mapValues(_.size.toLong)
        exact.forall { case (k, n) => est(k) >= n }
      }
    }

  property("cells(a ++ b) == cellwise cells(a) + cells(b)") =
    forAll(Gen.listOf(Gen.oneOf("p", "q", "r", "s")),
        Gen.listOf(Gen.oneOf("q", "r", "s", "t"))) { (a, b) =>
      val cfg = CountMin.Config(depth = 2, width = 8)
      def cellMap(df: DataFrame): Map[(Int, Long), Long] =
        df.collect()
          .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val whole = cellMap(CountMin.cells(items(a ++ b), "item", cfg))
      val ca = cellMap(CountMin.cells(items(a), "item", cfg))
      val cb = cellMap(CountMin.cells(items(b), "item", cfg))
      val merged = (ca.keySet ++ cb.keySet).map { k =>
        k -> (ca.getOrElse(k, 0L) + cb.getOrElse(k, 0L))
      }.toMap
      whole == merged
    }
}
