package graft.expressions

import graft.SparkTestSession
import graft.dedup.MinHashLSH
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Band-for-band bit-equality of the native one-pass
  * [[MinHashBands]] expression against the aggregate pipeline it
  * replaced — explode the shingle array, md5-prefix-hash each posting,
  * `groupBy(doc_id).agg(min((h0*a_i+b_i) & mask) ...)`, then per-band
  * `md5(concat_ws(":", h_i, h_j))` — over random shingle sets
  * including EMPTY arrays (must emit no band rows), arrays with null
  * elements (skipped, like `min` over null), and all-null arrays
  * (band = md5 of the null-skipping concat, matching the aggregate's
  * all-null minima row). This is the contract every LSH consumer's
  * DuckDB oracle relies on: the oracle SQL keeps the explode/GROUP BY
  * form, so the native path must land each doc in the identical
  * buckets.
  */
object MinHashBandsProps extends Properties("MinHashBands") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  private lazy val spark = SparkTestSession.spark

  private val genShingle: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr.map(_.take(12)),
    Gen.oneOf("a b c", "中 文 字", "x:y", ""))

  private val genDoc: Gen[List[Option[String]]] = Gen.frequency(
    6 -> Gen.choose(1, 10).flatMap(n =>
      Gen.listOfN(n, genShingle.map(Option(_)))),
    1 -> Gen.const(Nil),
    1 -> Gen.choose(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.const(Option.empty[String]))),
    1 -> Gen.choose(2, 6).flatMap(n => Gen.listOfN(n,
      Gen.frequency(3 -> genShingle.map(Option(_)),
        1 -> Gen.const(Option.empty[String])))))

  /** The replaced pipeline, verbatim: explode → md5-prefix postings →
    * min-aggregate per seed → per-band md5(concat_ws).
    */
  private def aggregateBands(docs: org.apache.spark.sql.DataFrame,
      cfg: MinHashLSH.Config): org.apache.spark.sql.DataFrame = {
    val posts = docs.select(col("doc_id"), explode(col("shingles")).as("sh"))
      .select(col("doc_id"),
        graft.text.TextFeatures.md5PrefixLong(col("sh"), 12).as("h0"))
    val aggs = (0 until cfg.numHashes).map { i =>
      val (a, b) = MinHashLSH.coeffs(i)
      min((col("h0") * a + b).bitwiseAND(lit(MinHashLSH.Mask48))).as(s"h$i")
    }
    val sigs = posts.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    val bandVals = (0 until cfg.numBands).map { j =>
      md5(concat_ws(":", (0 until cfg.rowsPerBand).map(r =>
        col(s"h${j * cfg.rowsPerBand + r}").cast("string")): _*))
    }
    sigs.select(col("doc_id"),
      posexplode(array(bandVals: _*)).as(Seq("band_id", "band_val")))
  }

  private def check(docLists: List[List[Option[String]]],
      cfg: MinHashLSH.Config): Boolean = {
    import spark.implicits._
    val docs = docLists.zipWithIndex
      .map { case (ss, i) => (i.toLong, ss.map(_.orNull)) }
      .toDF("doc_id", "shingles")
    val native = MinHashLSH.bands(docs, cfg)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val agg = aggregateBands(docs, cfg)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    native == agg
  }

  property("native bands == aggregate bands (default 6x2)") =
    forAll(Gen.listOfN(12, genDoc))(check(_, MinHashLSH.Config()))

  property("native bands == aggregate bands (Sharp 16x4)") =
    forAll(Gen.listOfN(6, genDoc))(check(_, MinHashLSH.Sharp))
}
