package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver testdata layout
  * (/root/repo/TESTDATA.md): one parquet per table under the sf dir.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Load + round-robin repartition to the session's parallelism.
    *
    * The testdata tables are single parquet files small enough to be
    * ONE input split, which would serialize every downstream per-row
    * computation onto one core — fatal for the CPU-heavy operators
    * (shingling, hashing, embedding folds). At production scale the
    * file-split count provides this parallelism for free and the
    * repartition would be a pure waste, so this is a harness-side
    * choice in the query wrappers, NOT baked into the operators.
    */
  def loadSpread(spark: SparkSession, dir: String, name: String): DataFrame =
    load(spark, dir, name)
      .repartition(spark.sparkContext.defaultParallelism)

  /** The events parquet stores `ts` as TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects. We read nanos as long
    * (`spark.sql.legacy.parquet.nanosAsLong=true`, set in the session)
    * and truncate to microseconds with integral division (a double
    * division would lose precision above 2^53 ns). DuckDB truncates
    * nanos→micros the same way, so the oracle lines up.
    */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          timestamp_micros(expr("ts DIV 1000")).cast("timestamp_ntz"))
      case _ => raw
    }
  }
}
