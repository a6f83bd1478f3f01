package graft.expressions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Bit-equality of the native md5-prefix hash against the declarative
  * conv-chain it replaced — `conv(substring(md5(s), 1, d), 16, 10)
  * cast long` — over random strings (ASCII, Unicode, empty) and every
  * supported digit count. This is the contract every hash-keyed
  * operator's oracle relies on: the oracle SQL keeps the textual conv
  * form, so the native path must produce the identical longs.
  */
object Md5PrefixLongProps extends Properties("Md5PrefixLong") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkTestSession.spark

  private val genStrings: Gen[List[String]] = Gen.listOfN(40,
    Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf("å", "ß", "中", "文", "я", "🙂", " ", "a"))
        .map(_.mkString),
      Gen.const("")))

  property("native prefix == conv(substring(md5)) for digits 1..15") =
    forAll(genStrings, Gen.choose(1, 15)) { (ss, digits) =>
      import spark.implicits._
      val df = ss.toDF("s")
      val rows = df.select(
          Md5PrefixLong(col("s"), digits).as("native"),
          conv(substring(md5(col("s")), 1, digits), 16, 10)
            .cast("long").as("chain"))
        .collect()
      rows.forall(r => r.getLong(0) == r.getLong(1))
    }

  property("null input hashes to null, like md5") = {
    import spark.implicits._
    val r = Seq[Option[String]](None, Some("x")).toDF("s")
      .select(Md5PrefixLong(col("s"), 12).as("h")).orderBy("h").collect()
    r.count(_.isNullAt(0)) == 1
  }
}
