package graft


/** Scratch profiling main (not part of the bench contract): times each
  * named query N times in one session to separate first-touch costs
  * (file listing, codegen, AQE planning) from steady-state execution.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "diff_flags", "dedup_minhash", "dedup_ngram", "dedup_clusters",
      "pipeline_curate")
    val spark = Sessions.local("32")

    names.foreach { name =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"PROFILE $name%-20s ${times.map(t => f"$t%7.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
