ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "alspysparkspark"
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
  // Heap is PINNED at 8g: measured in round 3 (PLANS.md), a 48g heap makes
  // Tungsten dedup/agg stages 2-5× slower with wild variance (page sizing +
  // GC never reclaiming accumulated broadcast/shuffle state between
  // queries), so an env-provided oversized heap silently wrecks the bench.
  // Override explicitly via SPARK_GRAFT_JAVA_OPTS (appended later — the
  // last -Xmx wins) when a run genuinely needs more.
  "-Xmx8g",
  // ~60 codegen-heavy queries in one JVM approach the default 240m JIT
  // code cache; when it fills, compilation stops and late queries run
  // interpreted — an order-of-magnitude, hard-to-reproduce slowdown.
  "-XX:ReservedCodeCacheSize=512m",
  // Parquet/Netty JNI critical sections can starve allocation during big
  // array bursts (the ×1000 in-block build tripped a spurious OOM with the
  // default retry count of 2 — SCALING §13.1 finding 3). Retry harder
  // before declaring OOM; a no-op on runs that never hit the GCLocker.
  "-XX:+UnlockDiagnosticVMOptions", "-XX:GCLockerRetryAllocationCount=64",
) ++ sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq.flatMap(_.split(" ").filter(_.nonEmpty))
// SPARK_DRIVER_MEM used to size the heap; it is deliberately ignored now
// (see the -Xmx8g note above). Warn instead of silently dropping it.
Global / onLoad := {
  val prev = (Global / onLoad).value
  if (sys.env.contains("SPARK_DRIVER_MEM"))
    sLog.value.warn(
      "SPARK_DRIVER_MEM is ignored (heap pinned at -Xmx8g; oversized heaps " +
        "measured 2-5x slower). Use SPARK_GRAFT_JAVA_OPTS=\"-Xmx<size>\" to override.")
  prev
}
