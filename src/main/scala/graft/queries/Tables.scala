package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver testdata layout
  * (/root/repo/TESTDATA.md): one parquet per table under the sf dir.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

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
