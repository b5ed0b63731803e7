ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "orcaztbuspythonprocessorspark"
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
// Heap: this is a single-JVM local[32] stand-in for a whole cluster — one
// JVM hosts the driver AND all 32 executor threads. The old 8g default
// (0.25 GB/core) made the heaviest queries GC-bound IN-HARNESS while their
// isolated medians were fine: BENCH_DETAIL r9 recorded 21.2 s of GC over an
// 82 s suite (26% of wall), and the queries that "regressed" round-over-
// round (q70, z_ztbus_session_stats) were exactly the ones timed under
// end-of-suite heap pressure. 28g ≈ 0.9 GB/core matches what a real
// executor would get; -Xms pinned to -Xmx so heap-resize GCs don't land in
// timed reps. The bench env block records xmx, so this is auditable.
//
// Young-gen cap: a big G1 heap with no cap is a measured pathology, not a
// free win. Under 28g alone, G1 let the young gen balloon (no GC at all
// for tens of seconds) so hot allocation walked linearly through tens of
// GB of cold pages — and the allocation-heavy single-thread tails
// (double→decimal casts in the z_ztbus aggregates) transiently ran ~10x
// slower (reps of 3 s spiking to 30-64 s with ZERO GC time; jstack showed
// the same frames, just slower — TLB/page-zeroing cost, still present
// under -XX:+AlwaysPreTouch, absent at -Xmx8g). Capping young at 10%
// (2.8 GB, recycled hot) restored 8g's stability at every rep while
// keeping the large heap's execution-memory headroom: ZRepro A/B in
// DECISIONS.md round 9.
//
// The default is derived from the machine (min(28g, half of physical RAM),
// floor 2g) so a smaller host gets a JVM that starts instead of an opaque
// "could not reserve enough space" init failure; the bench-grade 28g only
// applies where the RAM for it exists. SPARK_DRIVER_MEM overrides either way.
val driverMemDefault: String = {
  val physGb =
    try java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
      .getTotalMemorySize / (1024L * 1024L * 1024L)
    catch { case _: Throwable => 56L }
  s"${math.max(2L, math.min(28L, physGb / 2))}g"
}
val driverMem = sys.env.getOrElse("SPARK_DRIVER_MEM", driverMemDefault)
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverMem", s"-Xms$driverMem",
  "-XX:+UnlockExperimentalVMOptions", "-XX:G1MaxNewSizePercent=10",
)
