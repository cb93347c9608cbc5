ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mempooldumpsterspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Per-test durations in the report (-oD): the r21 driver's test run was
// cut off mid-suite with no failed assertion — finding and trimming the
// slowest specs needs the suite to SAY where its time goes.
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
// Suites run SEQUENTIALLY in the forked JVM: they all share one lazy
// SparkTestSession, and concurrent suites racing on its session conf and
// CacheManager flipped pinned plan shapes (measured r22: SemIndexSpec's
// joined-fallback WindowGroupLimit pin lost its Partial half only under
// the full parallel suite — green in isolation). Sequential execution
// makes the suite deterministic; Spark parallelizes inside each test.
Test / parallelExecution := false
run / fork := true
// Forked run stdout must pass through UNDECORATED: sbt's default logger
// prepends "[info] " to every forked-process line, which breaks any
// consumer that parses our single-line JSON output (Bench's summary line
// reached the driver as `[info] {...}` — unparseable). StdoutOutput
// inherits the parent's stdout/stderr directly, no log-prefix rewrite.
run / outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
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
  // TCP_NODELAY for com.sun.net.httpserver (read once at class load):
  // without it every loopback request pays the 40 ms Nagle/delayed-ACK
  // stall — measured 44 -> 1.7 ms/call on the JSON-RPC fixture endpoint
  "-Dsun.net.httpserver.nodelay=true",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // batch-throughput GC: the parse/merge path allocates heavily across all
  // 32 task threads; ParallelGC measured faster than the default G1 here
  "-XX:+UseParallelGC",
)
