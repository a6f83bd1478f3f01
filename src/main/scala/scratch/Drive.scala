package graft.similarity

import graft.Sessions
import graft.queries.Tables
import graft.expressions.DotProduct

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import scala.collection.mutable

object ScratchDrive {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    sys.env.get("SCRATCH_HML").foreach(v =>
      spark.conf.set("spark.sql.codegen.hugeMethodLimit", v))
    val dir = "/root/testdata/sf0.1"
    val stages = mutable.ArrayBuffer[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages += s"s${s.stageInfo.stageId}(t=${s.stageInfo.numTasks} " +
          s"cpu=${s.stageInfo.taskMetrics.executorCpuTime / 1000000}ms)"
    })
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $tag ${(System.nanoTime() - t0) / 1e9}%.2f  " +
        stages.mkString(" "))
      stages.clear(); r
    }
    val cfg = ProductQuant.Config()
    val emb = Tables.loadSpread(spark, dir, "embeddings")
    val df = ProductQuant.topK(emb, "vec_id", "embedding", 64, _ < 8, 10, cfg)
    def noop(d: org.apache.spark.sql.DataFrame) =
      d.write.format("noop").mode("overwrite").save()
    t("pq1")(noop(df))
    t("pq2")(noop(df))
    t("pq3")(noop(df))
    val km = graft.queries.SimilarityQueries.queries("embed_kmeans")(spark, dir)
    t("km1")(noop(km))
    t("km2")(noop(km))
    spark.stop()
  }
}
