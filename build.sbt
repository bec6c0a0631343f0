ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "xpysomdaskspark"
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
// The per-round bench driver keeps only the tail of stdout and parses
// the LAST line as the headline JSON. With the default LoggedOutput
// strategy sbt prefixes every forked-process line with "[info] " and
// appends its own "[success] Total time..." trailer, so the headline is
// never the literal last line (BENCH_r06..r08 all recorded
// `parsed: null` for exactly this reason). StdoutOutput passes the
// forked JVM's stdout through verbatim; showSuccess drops the trailer.
outputStrategy := Some(StdoutOutput)
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is read by sbt's command layer, not by another setting —
// the lintUnused warning is a false positive (verified: the trailer is
// gone from run output with this set)
Global / excludeLintKeys += showSuccess
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
  // lets dev.ludovic.netlib pick its SIMD VectorBLAS implementation
  // instead of falling back to pure-Java F2j (~3x on the gemm hot path)
  "--add-modules=jdk.incubator.vector",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
