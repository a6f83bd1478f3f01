package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaConformSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val target = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  test("adds typed nulls, casts, drops extras — with a full audit") {
    // batch: id is INT (widening cast), score missing, stray 'extra'
    val batch = Seq((1, "a", "x"), (2, "b", "y")).toDF("id", "name", "extra")
    val (out, actions) = SchemaConform.conform(batch, target)
    // names and types conform; tighter (non-null) input nullability may
    // survive — stricter than the target is fine
    assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      target.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(out.orderBy("id").collect().map(_.toString).toSeq ===
      Seq("[1,a,null]", "[2,b,null]"))
    assert(actions.map(a => a.column -> a.action).toMap === Map(
      "id" -> "cast", "name" -> "keep", "score" -> "add_null",
      "extra" -> "drop_extra"))
  }

  test("order conforms too; identical schema is all-keep") {
    val batch = Seq((0.5, 7L, "n")).toDF("score", "id", "name")
    val (out, actions) = SchemaConform.conform(batch, target)
    assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      target.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(actions.forall(_.action == "keep"))
  }

  test("an incompatible retype rejects loudly instead of nulling data") {
    val batch = Seq((1L, "a", Seq(1, 2))).toDF("id", "name", "score")
    val e = intercept[IllegalArgumentException] {
      SchemaConform.conform(batch, target)
    }
    assert(e.getMessage.contains("score"))
  }

  test("conformUnion folds a drifted batch into the standing table") {
    val standing = Seq((1L, "a", 0.5)).toDF("id", "name", "score")
    val batch = Seq((2, "b")).toDF("id", "name") // int id, no score
    val out = SchemaConform.conformUnion(standing, batch)
      .orderBy("id").collect().map(_.toString).toSeq
    assert(out === Seq("[1,a,0.5]", "[2,b,null]"))
  }

  test("conforming is a pure projection — no exchange") {
    val batch = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val t = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("n_chars", IntegerType), // narrow cast
      StructField("crawl_batch", StringType))) // missing -> null
    val (out, _) = SchemaConform.conform(batch, t)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(out.count() > 0)
  }
}
