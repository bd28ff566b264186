ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etlasanaspark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Throughput collector for the batch-shaped bench/verify workload:
  // G1's pause-time goal spends CPU on concurrent marking that a
  // sum-of-query-times metric pays for directly. Measured on the full
  // 158-query sf0.1 bench (same host window, back to back):
  //   8g  G1       84.4 s      8g  ParallelGC 63.5 s
  //   28g G1       79.3 s      28g ParallelGC 58.9-61.0 s
  // — the collector choice alone is ~25%; the larger heap adds ~3 s by
  // cutting major-GC frequency for the allocation-heavy pair kernels.
  "-XX:+UseParallelGC",
)
// The bench/verify drivers parse the LAST stdout line as a JSON metric;
// sbt's "[success] Total time: N s" epilogue after the forked JVM exits
// broke that parse two rounds running ("parsed": null). Suppress it, and
// pass the forked JVM's streams through unprefixed (the default logged
// strategy would prepend "[info] " to the metric line itself).
Global / showSuccess := false
run / outputStrategy := Some(StdoutOutput)
// showSuccess is consumed by the command engine, not a task — exclude it
// from the unused-key lint so `sbt compile` output stays warning-free
Global / excludeLintKeys += showSuccess
