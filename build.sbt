ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ethereum_analytical_dbspark"
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
// The bench/verify mains speak a one-JSON-line stdout contract with the
// driver; sbt's default LoggedOutput prefixes every forked-process line
// with "[info] " and appends its own "[success] Total time" line, which
// has made the driver's bench parser record parsed:null in EVERY round
// (it reads the last stdout line). StdoutOutput passes the forked
// process's stdout through raw, and showSuccess drops the trailer, so
// the final line of `sbt runMain graft.Bench` IS the JSON result.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
ThisBuild / showSuccess := false
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
  // The 100+-query suite generates enough codegen classes to exhaust
  // the default 240m JIT code cache mid-run; HotSpot then deoptimizes
  // hot Catalyst analysis paths and plan construction slows 5-10x
  // (measured: Scratch agingprobe). Size it so compilation never stops.
  "-XX:ReservedCodeCacheSize=1g",
)
