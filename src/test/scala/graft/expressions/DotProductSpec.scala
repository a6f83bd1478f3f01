package graft.expressions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DotProductSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** The interpreted reference formulation. Merge is `v + acc`
    * (REVERSED) so the RewriteDotProduct optimizer rule — which only
    * matches `acc + v` — leaves it alone and this really compares the
    * native expression against the lambda fold. IEEE addition is
    * commutative, so the values are still bit-identical.
    */
  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => v + acc)

  test("bit-identical to the HOF fold on the real embeddings table") {
    val emb = graft.queries.Tables
      .load(spark, "/root/testdata/sf0.001", "embeddings")
    val both = emb.as("a").join(emb.as("b"), $"a.vec_id" < $"b.vec_id")
      .limit(500)
      .select(DotProduct($"a.embedding", $"b.embedding").as("native"),
        hofDot($"a.embedding", $"b.embedding").as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      // === on doubles: BIT-equality is the contract, not approximation
      assert(r.getDouble(0) === r.getDouble(1))
    }
  }

  test("null semantics: null array, null element, length mismatch") {
    val df = Seq(
      (1L, Seq[Option[Float]](Some(1f), Some(2f)), Seq[Option[Float]](Some(3f), Some(4f))),
      (2L, null, Seq[Option[Float]](Some(1f), Some(2f))),
      (3L, Seq[Option[Float]](Some(1f), None), Seq[Option[Float]](Some(1f), Some(2f))),
      (4L, Seq[Option[Float]](Some(1f)), Seq[Option[Float]](Some(1f), Some(2f)))
    ).toDF("id", "a", "b")
    val got = df.orderBy("id")
      .select(DotProduct($"a", $"b")).collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq === Seq(Some(11.0), None, None, None))
  }

  test("mixed float/double element types widen exactly") {
    val df = Seq((Seq(1.5f, 2.5f), Seq(2.0d, 4.0d))).toDF("f", "d")
    val r = df.select(DotProduct($"f", $"d")).head.getDouble(0)
    assert(r === 1.5 * 2.0 + 2.5 * 4.0)
  }

  test("registered in SQL via GraftExtensions: dot_product(...) parses and runs") {
    Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
      .createOrReplaceTempView("dp_in")
    val r = spark.sql("SELECT dot_product(a, b) AS d FROM dp_in").head
    assert(r.getDouble(0) === 32.0)
    // wrong arity is an analysis-time error, not a runtime surprise
    intercept[Exception](spark.sql("SELECT dot_product(a) FROM dp_in").collect())
  }

  test("optimizer rule rewrites the canonical HOF fold to dot_product") {
    val emb = graft.queries.Tables
      .load(spark, "/root/testdata/sf0.001", "embeddings")
    val canonical = emb.select(
      aggregate(zip_with($"embedding", $"embedding",
          (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("n"))
    val opt = canonical.queryExecution.optimizedPlan.toString
    assert(opt.contains("dot_product") && !opt.contains("aggregate("),
      s"expected the HOF fold rewritten to dot_product:\n$opt")
    // rewritten plan computes the same values as the native call
    val direct = emb.select(DotProduct($"embedding", $"embedding").as("n"))
      .collect().map(_.getDouble(0))
    assert(canonical.collect().map(_.getDouble(0)).toSeq === direct.toSeq)
  }

  test("optimizer rule leaves non-matching folds alone") {
    // reversed merge order, non-zero seed, non-multiply zip: all skipped
    val df = Seq((Seq(1f, 2f), Seq(3f, 4f))).toDF("a", "b")
    val plans = Seq(
      aggregate(zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => v + acc),
      aggregate(zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
        lit(1.0), (acc, v) => acc + v),
      aggregate(zip_with($"a", $"b", (x, y) => x.cast("double") + y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    ).map(c => df.select(c.as("n")).queryExecution.optimizedPlan.toString)
    plans.foreach(p => assert(!p.contains("dot_product"),
      s"conservative rule fired on a non-canonical fold:\n$p"))
  }

  test("stays inside whole-stage codegen (no CodegenFallback)") {
    val emb = graft.queries.Tables
      .load(spark, "/root/testdata/sf0.001", "embeddings")
    val plan = emb.select(DotProduct($"embedding", $"embedding").as("n"))
      .queryExecution.executedPlan
    // the projection containing the expression must be codegen'd: it sits
    // under a WholeStageCodegen node (toString marks those with '*')
    val s = plan.toString
    assert(s.contains("*(1) Project") || s.contains("WholeStageCodegen"),
      s"expected codegen'd project, got:\n$s")
  }
}
