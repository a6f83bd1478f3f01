ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pysparkdatacoldiffspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// pass forked-run stdout through VERBATIM (no "[info] " log prefix):
// the harness parses graft.Bench's one-line JSON metrics from raw
// stdout, and sbt's default logger decoration has defeated that parse
// every round (BENCH_r*.json "parsed": null since round 1)
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and keep sbt's own "[success] Total time" epilogue out of the
// window: the harness keeps only the last 2000 chars of output, and the
// ~80-char success line would eat the final metric line's tail margin
// (87 bench queries → ~1920-char line with the sf basename; adding a
// bench slot costs ~22 chars — re-check the margin when adding slots)
Global / showSuccess := false
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // ~70 bench queries × whole-stage codegen: the 240 MB default code
  // cache starts sweeping hot compiled methods late in the run, which
  // shows up as spurious slowdowns of whatever queries run last
  "-XX:ReservedCodeCacheSize=512m",
  // Throughput collector, NOT the G1 default. Measured on the full
  // 85-slot bench fleet (same host, back-to-back): G1 raw 51.6 s vs
  // ParallelGC 36.7 s (−29%), and the allocation-heavy calibration
  // probe itself dropped 2.16 → 0.95 — G1's concurrent cycles +
  // region management were the "memory regime" sensitivity the bench
  // chased for four rounds: short-lived batch queries over a 16 GB
  // heap want max throughput and tolerate pauses, the exact ParallelGC
  // trade. A real cluster sets its own executor GC; this flag is the
  // HARNESS JVM. SPARK_GRAFT_GC overrides (e.g. =G1 to compare).
) ++ Seq(s"-XX:+Use${sys.env.getOrElse("SPARK_GRAFT_GC", "Parallel")}GC")
