ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hermesspark"
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
// Forked run output must reach stdout VERBATIM: the default forked
// outputStrategy routes child stdout through sbt's logger, prefixing
// every line with "[info] " — which is exactly what broke the driver's
// JSON-line parse of the bench output in rounds 11–12 (r01's bare JSON
// line predates fork := true). StdoutOutput passes it through untouched.
run / outputStrategy := Some(StdoutOutput)
// ... and drop the trailing "[success] Total time: …" footer so the
// LAST stdout line of a `runMain graft.Bench` invocation is the bench
// JSON itself, not an sbt status line a JSON parser chokes on.
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not by a task —
// lintUnused can't see that and would warn on every launch
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
) ++
  // extra -D flags for a forked main (e.g. raising a spark.graft.* conf
  // for a ceiling-headroom soak) without editing this file
  sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq
    .flatMap(_.trim.split("\\s+").filter(_.nonEmpty))
