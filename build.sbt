ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "laionspark"
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
// Driver-parseable run output (r22 verdict item 1): forked runMain
// output used to route through sbt's logger, which prefixes every
// program line with "[info] " — so no stdout line ever parsed as bare
// JSON and the round driver recorded parsed:null in EVERY round (r14–
// r21 all null; the r21 tail shows the digest line complete inside the
// capture window yet unparsed). StdoutOutput inherits the child's
// streams directly: program stdout stays unprefixed, Spark's log4j
// noise stays on stderr. showSuccess=false drops the trailing
// "[success] Total time ..." line, so Bench's single JSON record is
// the LAST line on stdout.
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command loop, not a task — exclude
// it from the unused-key lint so the warning doesn't precede every run
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
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
