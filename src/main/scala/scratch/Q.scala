package scratch
import graft.Sessions
object Q {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4")
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("""SELECT percentile_disc(0.25) WITHIN GROUP (ORDER BY x) q25,
      percentile_disc(0.5) WITHIN GROUP (ORDER BY x) q50,
      percentile_disc(0.75) WITHIN GROUP (ORDER BY x) q75
      FROM VALUES (1.0),(2.0),(3.0),(4.0) t(x)""").show(false)
    spark.stop()
  }
}
