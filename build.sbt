ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kstreamsspark"
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
// Forked run output goes straight to this process's stdout (no sbt
// "[info] " logger prefix), and sbt's trailing "[success] Total time"
// line is suppressed — together these make graft.Bench's final compact
// JSON line the literal last line of `sbt "runMain graft.Bench"`
// output, which a short stdout-tail capture can always parse.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
Global / showTiming := false
// the two keys above are read by sbt's command layer, not other tasks —
// exclude them from the unused-key lint so startup stays warning-free
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
// Heap: -Xmx is a CEILING, not a reservation — the single-JVM local[32]
// session puts driver + all 32 executor threads' unified memory in one
// heap, and 8g starves it (measured r17: q_setsim_join 43 s cold /
// 11-14 s warm at 8g vs 13 s / 2.4-4 s at a large heap, gc_delta 3.4 s
// vs 0.2 s — the board's shuffle-heavy lines were GC-bound, not
// CPU-bound). 48g leaves >60% of the 128 GiB host for co-tenants while
// giving the 32 threads ~900 MB of unified memory each.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
