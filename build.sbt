ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "magictablesspark"
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
// All suites share ONE SparkSession in one forked JVM; running them in
// parallel stacks every suite's cached/checkpointed storage plus several
// concurrent queries' execution memory into the same heap, which OOMs
// nondeterministically depending on suite scheduling. Sequential suites
// give a deterministic memory profile.
Test / parallelExecution := false
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "10g")}",
)
// The bench/verify harness tail-parses stdout for ONE compact JSON line.
// sbt's default LoggedOutput prefixes every forked-run line with "[info] "
// and appends "[success] Total time: ..." after the run — both defeat a
// last-line JSON parse. StdoutOutput forwards the forked JVM's stdout
// verbatim; showSuccess drops the trailing banner, so the compact JSON
// emitted by graft.Bench/graft.Verify IS the final stdout line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is read by sbt's command loop, not by another setting —
// exclude it from the unused-key lint so every build isn't a [warn] wall
Global / excludeLintKeys += showSuccess
