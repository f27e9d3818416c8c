ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "migbqspark"
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
// The driver tails stdout of `sbt "runMain graft.Bench"` and json-parses
// a line out of it. sbt's default LoggedOutput prefixes every forked
// stdout line with "[info] " — which breaks a per-line JSON parse — and
// appends a "[success] Total time ..." line after the program's last
// line. Pass forked output through verbatim and drop the success banner
// so the bench's final printed line IS the last line of stdout.
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command loop, not by a task — the
// lintUnused heuristic can't see that
Global / excludeLintKeys += showSuccess
// All suites share one SparkSession, and a couple of tests touch
// process-global state (JVM default Locale; session-state inspection):
// keep suite execution strictly sequential in the forked test JVM so
// no concurrently-planned query can observe mutated globals.
Test / parallelExecution := false
Test / testForkedParallel := false
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
