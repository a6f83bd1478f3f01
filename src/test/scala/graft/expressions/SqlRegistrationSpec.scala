package graft.expressions

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Every native expression is reachable from plain SQL text through
  * `GraftExtensions` — the Column API must not be the only door.
  */
class SqlRegistrationSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  Seq((1L, "The quick the QUICK fox")).toDF("id", "t")
    .createOrReplaceTempView("sql_reg_in")

  test("token_runs parses and runs from SQL") {
    val r = spark.sql("SELECT token_runs(t) FROM sql_reg_in").head
    assert(r.getSeq[String](0) === Seq("the", "quick", "the", "quick", "fox"))
  }

  test("word_shingles parses from SQL, distinct flag honored") {
    val d = spark.sql("SELECT word_shingles(t, 2) FROM sql_reg_in").head
    assert(d.getSeq[String](0) ===
      Seq("the quick", "quick the", "the quick", "quick fox").distinct)
    val a = spark.sql("SELECT word_shingles(t, 2, false) FROM sql_reg_in").head
    assert(a.getSeq[String](0) ===
      Seq("the quick", "quick the", "the quick", "quick fox"))
  }

  test("char_shingles parses and runs from SQL") {
    val r = spark.sql("SELECT char_shingles('AbÉd', 2)").head
    assert(r.getSeq[String](0) === Seq("ab", "bé", "éd"))
  }

  test("char_entropy parses from SQL and matches the Column form") {
    val r = spark.sql("SELECT char_entropy('aab')").head.getSeq[Double](0)
    assert(r(0) === 3.0 && r(2) === 2.0)
    val p1 = 2.0 / 3; val p2 = 1.0 / 3
    assert(r(1) === 0.0 - p1 * StrictMath.log(p1) - p2 * StrictMath.log(p2))
  }

  test("hilbert_index parses from SQL and matches the static walk") {
    val r = spark.sql(
      "SELECT hilbert_index(CAST(7 AS BIGINT), CAST(11 AS BIGINT))").head
    assert(r.getLong(0) === HilbertIndex.index(7L, 11L))
  }

  test("rolling_fingerprint matches the Column-API form") {
    val sql = spark.sql("SELECT rolling_fingerprint(t) FROM sql_reg_in")
      .head.getLong(0)
    val api = Seq("The quick the QUICK fox").toDF("t")
      .select(graft.text.Fingerprint.rollingHash(
        org.apache.spark.sql.functions.col("t"))).head.getLong(0)
    assert(sql === api)
  }

  test("apply_merge parses from SQL; non-literal rule is rejected") {
    val r = spark.sql("SELECT apply_merge('a a a', 'a', 'a')").head
    assert(r.getString(0) === "aa a")
    intercept[Exception](
      spark.sql("SELECT apply_merge(t, t, 'b') FROM sql_reg_in").collect())
  }

  test("minhash_bands parses from SQL and matches the Column-API form") {
    val sql = spark.sql(
      "SELECT minhash_bands(array('ab', 'cd', 'ef'), 6, 2)").head
    // compare against the bands() relation for one doc
    val rel = graft.dedup.MinHashLSH.bands(
      Seq((1L, Seq("ab", "cd", "ef"))).toDF("doc_id", "shingles"))
      .orderBy("band_id").collect().map(_.getString(2)).toSeq
    assert(sql.getSeq[String](0) === rel)
  }

  test("nearest_centroid parses from SQL with constant codebook arrays") {
    // two 2-dim centroids (0,0) and (10,10); q=(9,9) → cell 1,
    // d = qn + cn − 2·dot = 162 + 200 − 360 = 2
    val r = spark.sql(
      """SELECT nearest_centroid(array(9.0D, 9.0D), 162.0D,
        |  array(0L, 1L), array(0.0D, 200.0D),
        |  array(0.0D, 0.0D, 10.0D, 10.0D))""".stripMargin).head.getStruct(0)
    assert(r.getLong(1) === 1L && r.getDouble(0) === 2.0)
    // a non-constant codebook argument is rejected at plan build
    intercept[Exception](spark.sql(
      "SELECT nearest_centroid(array(1.0D), 1.0D, array(id), " +
        "array(1.0D), array(1.0D)) FROM sql_reg_in").collect())
  }

  test("floor_residual parses from SQL and matches the argmin's cell") {
    val r = spark.sql(
      """SELECT floor_residual(array(9.0D, 8.5D), 1L,
        |  array(0L, 1L), array(0.0D, 0.0D, 10.0D, 10.0D))""".stripMargin)
      .head.getSeq[Double](0)
    assert(r === Seq(-1.0, -2.0)) // floor(9-10), floor(8.5-10)
  }

  test("sign_pack_words parses from SQL with a constant plane matrix") {
    // 32 planes over dim 2: plane i = (1,0) for even i, (0,-1) odd →
    // vec (3, 5): even bits set (3>0), odd bits clear (-5<0) →
    // word = 0b1010...10 = 0xAAAAAAAA
    val flat = (0 until 32).map(i => if (i % 2 == 0) "1.0D, 0.0D"
      else "0.0D, -1.0D").mkString(", ")
    val r = spark.sql(
      s"SELECT sign_pack_words(array(3.0D, 5.0D), array($flat), 32)")
      .head.getSeq[Long](0)
    assert(r === Seq(0xAAAAAAAAL))
  }

  test("deflate_length parses from SQL and matches driver-side zlib") {
    val s = "abcabcabcabcabc"
    val got = spark.sql(s"SELECT deflate_length('$s')").head.getLong(0)
    val d = new java.util.zip.Deflater(6, true)
    d.setInput(s.getBytes("UTF-8")); d.finish()
    val buf = new Array[Byte](256)
    var n = 0
    while (!d.finished()) n += d.deflate(buf)
    d.end()
    assert(got === n)
  }

  test("count_in_set parses from SQL with a constant lexicon") {
    val r = spark.sql(
      "SELECT count_in_set(token_runs(t), array('the', 'fox')) " +
        "FROM sql_reg_in").head
    assert(r.getInt(0) === 3) // the, the, fox
  }

  test("deletion_neighborhood parses from SQL; d=1 variants") {
    val r = spark.sql("SELECT deletion_neighborhood('abc', 1)")
      .head.getSeq[String](0)
    assert(r.toSet === Set("abc", "bc", "ac", "ab"))
  }
}
