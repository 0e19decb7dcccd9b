ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mape_calculation_and_anonymizationspark"
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
  // local[32] runs 32 concurrent tasks in one JVM; 8g left the bench
  // GC-bound (q22 measured 4x slower under sbt than with a 16g shell)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // A ~200-query session JIT-compiles thousands of generated stages; at
  // the JVM's default 240 MB code cache the sweeper starts flushing
  // profiled compiled code mid-session (Bench's SPARK_GRAFT_BENCH_DIAG=1
  // readings show the profiled code heap shrinking while total usage
  // climbs). Headroom keeps steady-state sessions out of sweeper churn.
  // NOTE: this was tested as a suspect for the round-13 IVF-family
  // session inflation and RULED OUT (1g changed nothing) — that was JIT
  // type-profile pollution on the nearest-cells ArrayData call site,
  // fixed in the kernel itself (BASELINE round-14 note).
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_CODE_CACHE", "1g")}",
)
// Tests allocate every store/checkpoint dir via Files.createTempDirectory
// (java.io.tmpdir) and rely on the OS to reclaim it. On a host whose /tmp
// is small, shared, or already littered, a 500-test run can fill it and
// kill a streaming micro-batch mid-write (the failure then surfaces as a
// MicroBatchExecution stack from inside processAllAvailable — exactly the
// round-18 driver-only test failure signature). Point the forked test
// JVM's tmpdir at a per-run-wiped dir under target/ instead: same
// behavior everywhere, no dependence on the host's /tmp state.
Test / javaOptions += s"-Djava.io.tmpdir=${(target.value / "test-tmp").getAbsolutePath}"
Test / testOptions += {
  val d = target.value / "test-tmp"
  Tests.Setup(() => { IO.delete(d); IO.createDirectory(d) })
}
