package graft.expressions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Bit-equality of the native one-pass [[SimHashSig]] against the
  * aggregate pipeline it replaced — explode the shingle array,
  * md5-prefix-hash each posting, `groupBy(doc_id).agg(sum(±1) × 32)`,
  * pack sign bits — over random shingle sets including EMPTY arrays
  * (must emit no signature row), null elements (−1 to every counter,
  * the aggregate's otherwise-branch), and all-null arrays (signature
  * 0, a row that EXISTS). The dedup_simhash DuckDB oracle re-proves
  * the contract end-to-end each round with the explode/GROUP BY form.
  */
object SimHashSigProps extends Properties("SimHashSig") {

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

  /** The replaced pipeline, verbatim. */
  private def aggregateSig(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val posts = docs.select(col("doc_id"), explode(col("shingles")).as("sh"))
      .select(col("doc_id"),
        graft.text.TextFeatures.hash32(col("sh")).as("hv"))
    val bitSums = (0 until SimHashSig.Bits).map(k =>
      sum(when(shiftright(col("hv"), k) % 2L === 1L, 1L).otherwise(-1L))
        .as(s"s$k"))
    val sig = (0 until SimHashSig.Bits)
      .map(k => when(col(s"s$k") > 0, lit(1L << k)).otherwise(lit(0L)))
      .reduce(_ + _)
    posts.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), sig.as("simhash"))
  }

  property("native signature == aggregate signature") =
    forAll(Gen.listOfN(12, genDoc)) { docLists =>
      import spark.implicits._
      val docs = docLists.zipWithIndex
        .map { case (ss, i) => (i.toLong, ss.map(_.orNull)) }
        .toDF("doc_id", "shingles")
      val native = docs.select(col("doc_id"),
          explode(SimHashSig(col("shingles"))).as("simhash"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val agg = aggregateSig(docs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      native == agg
    }
}
