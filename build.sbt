ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "projectcortexspark"
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
// The bench/verify collector tail-parses the LAST stdout line as JSON.
// sbt's default LoggedOutput wraps forked output as "[info] {...}" and
// appends a "[success] Total time ..." trailer — both break that parse
// (BENCH_r01..r04 all recorded parsed:null). StdoutOutput passes the
// forked JVM's stdout through raw; showSuccess kills the trailer.
run / outputStrategy := Some(StdoutOutput)
ThisBuild / showSuccess := false
// showSuccess is read by sbt's command loop, not a task — lint can't see it
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
// Size the forked JVM's heap to the machine (a third of physical RAM,
// clamped to [8g, 24g]) instead of a fixed 8g. Two failure modes bound
// the clamp, both measured on the same 128-query sf0.1 bench on the
// 125 GiB / 32-vCPU box: at 8g, storage eviction + GC pauses land
// multi-second spikes on arbitrary queries (142s total, 15.8s worst
// query); past ~32g G1 cycles through so many never-before-touched heap
// pages that first-touch faults dominate (this VM's kernel makes
// concurrent faults very expensive — a probe JVM burned 4,483s of SYS
// cpu vs 922s of user; 32g/41g benched 76s where 24g benched 53-55s,
// repeatably). SPARK_DRIVER_MEM still overrides both ways.
val defaultDriverMem: String = {
  val totalKb =
    try scala.io.Source.fromFile("/proc/meminfo").getLines()
      .collectFirst { case l if l.startsWith("MemTotal:") =>
        l.trim.split("\\s+")(1).toLong }
      .getOrElse(0L)
    catch { case _: Throwable => 0L }
  val gb = totalKb / (1024L * 1024L)
  s"${math.max(8L, math.min(24L, gb / 3))}g"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", defaultDriverMem)}",
) ++
  // ad-hoc conf experiments without a rebuild: SparkConf reads spark.*
  // system properties, so SPARK_EXTRA_OPTS="-Dspark.x=y -Dspark.z=w"
  // reaches any conf the session builder doesn't pin explicitly
  sys.env.get("SPARK_EXTRA_OPTS").toSeq.flatMap(_.split("\\s+")).filter(_.nonEmpty)
