ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cryptodataingestionmodulespark"
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
// Forked-run output goes straight to stdout, NOT through sbt's logger:
// the driver greps the bench/verify JSON line, and the logger's
// "[info] " prefix broke its parse in rounds 1 and 2 (BENCH_r0*.json
// carried "parsed": null both times).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // SMALL fixed heap, deliberately: this virtualized guest intermittently
  // degrades to ~8 MB/s page-fault-in (measured; one allocating thread
  // burns pure kernel time while every other thread parks on its codegen
  // KeyLock — no GC, no throttle). The total fault tax per JVM is
  // bounded by the pages the heap ever touches, and G1 cycles eden
  // through the WHOLE committed pool, so a 16 GB heap eventually faults
  // 16 GB (≈ 30 min in degraded mode) while a 6 GB heap caps the worst
  // case at ~12 min and usually pays nothing. Live data peaks ≈ 2.5 GB
  // at sf0.1; extra GC cycles reuse RESIDENT pages, which are ~free
  // compared to faulting new ones. Xms = Xmx so G1 never uncommits
  // (uncommit + re-fault was the original stall trigger). AlwaysPreTouch
  // is deliberately NOT used — touching the full heap up front can
  // itself take minutes in the degraded mode.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "6g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "6g")}",
  // Whole-stage codegen emits one class per stage across a ~50-query
  // session; the JDK default 240 MB code cache fills a few minutes in,
  // the JIT shuts off, and Janino compilation (now interpreted) goes
  // from ~1 s to 60–120 s per class — observed as random query stalls
  // with every task parked on CodeGenerator.compile's KeyLock.
  "-XX:ReservedCodeCacheSize=1g",
)
