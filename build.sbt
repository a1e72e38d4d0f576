ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "geziyorspark"
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
// The driver parses ONE bare JSON line from `sbt runMain graft.Bench`
// stdout. The default outputStrategy (LoggedOutput) prefixes every forked
// stdout line with `[info] `, which broke the parse two rounds running —
// StdoutOutput passes the child's stdout through raw.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// The driver parses the LAST stdout line; sbt's `[success] Total time: …`
// epilogue printed after the contract JSON left `parsed: null` three rounds
// running. Suppress it (errors still reach stderr via `[error]` log lines).
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// local-cluster[...] masters (the N-vs-4N-executor bench) need these in the
// forked JVM's environment so executor JVMs can be spawned.
run / envVars ++= Map(
  "SPARK_HOME" -> "/opt/spark",
  "SPARK_SCALA_VERSION" -> "2.13",
  "SPARK_WORKER_DIR" -> "/tmp/graft-spark-worker",
  "SPARK_LOG_DIR" -> "/tmp/graft-spark-logs",
)
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
// Driver heap: honor SPARK_DRIVER_MEM but CLAMP it — round-1's bench died
// (exit 137) with an oversized pre-touched heap competing with executor
// JVMs and tmpfs shuffle scratch for the same 128 GiB of physical RAM.
val driverMemGb: Int = {
  val req = sys.env.getOrElse("SPARK_DRIVER_MEM", "22g")
    .toLowerCase.stripSuffix("g")
  math.min(scala.util.Try(req.toDouble).getOrElse(22.0), 28.0).toInt
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${driverMemGb}g",
  // Firecracker microVM: first-touch page faults are expensive kernel time;
  // pre-touching a modest initial heap keeps them out of measured regions
  // (only Xms is pre-touched, so this stays RAM-cheap).
  "-Xms4g",
  "-XX:+AlwaysPreTouch",
  "-XX:+UseParallelGC",
)
