ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sparksqlflowpluginspark"
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
// The driver parses the LAST line of a `sbt "runMain graft.Bench"` run as
// the machine-readable bench JSON (BENCH_r*.json `parsed`). Two sbt
// behaviors have kept that line from ever being last: the default
// LoggedOutput strategy prefixes every forked stdout line with "[info] ",
// and sbt prints a "[success] Total time ..." trailer after the task.
// Pass forked output through verbatim and drop the success banner.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
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
  // The default 240 MB JIT code cache runs hot under the full bench
  // inventory (hundreds of generated classes × tiered compilation);
  // code-cache flushing evicts warm methods and forces re-JIT mid-run,
  // one measured source of same-plan cpu_s variance (BUILD_NOTES r15).
  "-XX:ReservedCodeCacheSize=512m",
) ++
  // ad-hoc diagnostic flags for probe sessions without editing the build
  // (e.g. SPARK_GRAFT_JVM_OPTS="-XX:+PrintCompilation" for JIT forensics).
  // LIMITATION: split on bare whitespace — a flag whose VALUE contains a
  // space (e.g. a quoted -XX:CompileCommand pattern) cannot be passed and
  // would silently become two broken args; none of the forensics flags
  // used so far need one, so this stays simple rather than growing an
  // escaping convention (r15 advice, documented).
  sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))
