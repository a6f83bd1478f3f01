package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Scratch diagnostic main (not part of the bench contract): runs each
  * named query once (after an untimed warmup run at the same SF, so
  * codegen/JIT is steady) and prints one line per Spark JOB with its
  * wall-clock and stage/task counts. Separates "few big jobs" from
  * "many small job launches" — the two need different fixes (shuffle
  * shape vs driver-side batching).
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("profile_diff")
    val spark = Sessions.local("32") // SPARK_GRAFT_AQE honored there

    val jobStart = mutable.Map.empty[Int, (Long, String)]
    val lines = mutable.ArrayBuffer.empty[String]
    var collecting = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (collecting) jobStart(e.jobId) =
          (System.nanoTime(), Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("").take(90))
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        if (collecting) jobStart.remove(e.jobId).foreach { case (t0, d) =>
          lines += f"    job ${e.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $d"
        }
    })

    names.foreach { name =>
      def run(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run(); spark.catalog.clearCache(); System.gc() // warm
      collecting = true
      val t = run()
      collecting = false
      spark.catalog.clearCache(); System.gc()
      println(f"TRACE $name total $t%.3f s")
      lines.foreach(println); lines.clear()
    }
    spark.stop()
  }
}
