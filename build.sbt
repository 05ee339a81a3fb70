ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "compressionspark"
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
// Forked run output must reach the DRIVER'S stdout unwrapped: sbt's default
// LoggedOutput prefixes every child line with "[info] ", which made the
// bench result line unparseable two rounds running (BENCH_r0{1,2}.json
// "parsed": null). StdoutOutput inherits sbt's own stdio instead.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // local-mode Spark = driver-only JVM; 32 concurrent tasks of
  // explode-heavy work GC-thrash in 8g (the box has 128 GiB)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "64g")}",
) ++ (
  // OPT-IN heap pre-commit for measurement runs (SPARK_GRAFT_PRETOUCH=1):
  // matches the bench's forked level JVMs (-Xms=-Xmx + pre-touch) so
  // sbt-run BenchExtra timings are comparable — G1 heap growth during
  // 32-thread allocation storms skews any timing taken after an
  // allocation-heavy query (BENCH/INTERFERENCE.md). NOT the default: the
  // official bench's ORCHESTRATOR runs via sbt and must stay thin (a fat
  // parent starves the forked levels of page cache — Bench.forkJava note).
  if (sys.env.contains("SPARK_GRAFT_PRETOUCH"))
    Seq(s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "64g")}", "-XX:+AlwaysPreTouch")
  else Seq.empty
)
