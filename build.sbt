ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dwhspark"
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
// Forked runMain output goes STRAIGHT to stdout — without this, sbt
// prefixes every line with "[info] ", which breaks machine parsing of
// Bench's JSON line (round 1's driver recorded parsed: null).
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and without these, sbt appends "[success] Total time: ..." AFTER the
// JSON line, so a parse-the-last-line driver still records parsed: null
// (round 2 did, even with raw stdout). Suppress the epilogue entirely:
// Bench's JSON must be the final line on stdout.
Global / showSuccess := false
Global / showTiming := false
// (read by sbt's command engine, not by tasks — lint can't see that)
Global / excludeLintKeys ++= Set(showSuccess, showTiming)
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
  // 16g default (box has 128 GiB): the r18 bench spent 4.25 s in GC at
  // 8g — headroom is cheaper than collector time on a 223-query suite.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
