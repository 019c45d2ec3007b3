ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "miniproject204721dataengineeringspark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// `sbt bench` — the sbt-initiated route to the SAME fork-free bench
// (r17 ask #6): execs tools/bench.sh with INHERITED stdio.
// ProcessBuilder.inheritIO attaches the child directly to this JVM's
// stdout/stderr file descriptors, so sbt's logger never frames the
// stat JSON line and bench.sh's channel discipline survives (stat
// JSON is the script's only stdout line; program output on stderr).
// bench.sh itself launches graft.Bench under plain `java -cp`, so the
// measured process still boots free of sbt's load spike. Env passes
// through; SPARK_GRAFT_SF_DIR defaults to the per-round driver dir.
lazy val bench = taskKey[Unit](
  "fork-free bench via tools/bench.sh (stat JSON unframed on stdout)")
bench := {
  val pb = new java.lang.ProcessBuilder(
    (baseDirectory.value / "tools" / "bench.sh").getAbsolutePath)
  pb.directory(baseDirectory.value)
  if (!sys.env.contains("SPARK_GRAFT_SF_DIR"))
    pb.environment().put("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
  pb.inheritIO()
  val rc = pb.start().waitFor()
  if (rc != 0) sys.error(s"tools/bench.sh exited $rc")
}
