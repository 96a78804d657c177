ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "duplicatefinderspark"
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
// Forked `run` writes straight to this process's stdout/stderr instead of
// the sbt logger: benchmark/verify JSON lines must arrive unprefixed (no
// [info]/[error]) so the round driver can machine-parse them.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ... and nothing may print AFTER them: suppress sbt's trailing
// "[success] Total time: ..." footer so the benchmark's bare JSON line is
// the LAST line of stdout (a last-line parser then just works).
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not another task —
// exclude it from the unused-key lint so the warning doesn't precede
// machine-parsed output.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  s"-XX:+Use${sys.env.getOrElse("SPARK_GC", "G1")}GC",
) ++ (
  // Diagnostics opt-in (SPARK_PRETOUCH=1): commit + pre-touch the whole heap
  // at JVM startup. Probes this VM's first-touch page-fault cost, the prime
  // suspect for the observed rep1-vs-steady 10-30x gap on memory-hungry
  // queries (ivf_top1 rep1 180 s vs reps2+ 5-6 s). NOT a default: on this
  // host pre-touching 48g itself runs minutes (same slow-zeroing pathology),
  // so it trades a slow first rep for a slow startup.
  if (sys.env.get("SPARK_PRETOUCH").contains("1"))
    Seq(s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}", "-XX:+AlwaysPreTouch")
  else Seq.empty
) ++ sys.env.get("SPARK_GC_LOG").map(f => s"-Xlog:gc:$f").toSeq
