ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "herokukafkaconnectspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Suites share one SparkSession; some (LayoutSpec) toggle session confs
// that others (PlanSpec) assert on — run sequentially.
Test / parallelExecution := false
// The 50x scale-evidence suite is on-demand only (several minutes):
//   sbt "testOnly *ScaleSpec* -- -n Scale50x"
// Task-scoped filter: the aggregate `test` task skips it, testOnly can
// still select it (a -l exclude would veto the -n include).
Test / test / testOptions += Tests.Filter(_ != "graft.ScaleSpec50x")
run / fork := true
// The driver parses the LAST stdout line of `sbt runMain graft.Bench` as
// JSON. Two rounds of "parsed": null traced to sbt's logger: the default
// LoggedOutput strategy prefixes every forked-process line with
// "[info] " (so the JSON line never parses), and the "[success] Total
// time" banner prints after it (so it is never last either). StdoutOutput
// passes the forked JVM's stdout/stderr through verbatim; showSuccess
// drops the banner. Both are cosmetic to humans, load-bearing to the
// driver.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys ++= Set(run / outputStrategy, showSuccess)
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
