ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bharatmlstackspark"
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
// Split the test suites across a few concurrently-forked JVMs (r17
// verdict item 2: the single sequential forked JVM ran ~12 min on a
// quiet box and 39 min on the r17 contended one — outside the driver's
// witness window). Suites are independent — each JVM builds its own
// local SparkSession — and the workload is job-latency-bound (hundreds
// of tiny sf0.001 jobs), not CPU-bound, so 4 oversubscribed local[32]
// JVMs cut the wall ~3x. Round-robin over the name-sorted suite list
// keeps the groups deterministic and roughly balanced.
Test / testGrouping := {
  val opts = (Test / javaOptions).value.toVector
  val groups = 4
  (Test / definedTests).value.sortBy(_.name).zipWithIndex
    .groupBy(_._2 % groups).toSeq.sortBy(_._1)
    .map { case (i, tests) =>
      Tests.Group(s"g$i", tests.map(_._1),
        Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
    }
}
// allow all 4 group JVMs to actually run concurrently
Global / concurrentRestrictions := Seq(Tags.limitAll(8))
// Driver-capture hygiene (the BENCH_r16 parsed-null root cause): the
// driver records only the final 2000 chars of the sbt run's output and
// json-parses the tail. StdoutOutput passes the forked JVM's stdout
// through verbatim — metric lines land at column 0 with no sbt
// `[info] ` logger prefix — and showSuccess=false drops the
// `[success] Total time: …` epilogue, so the last line of a completed
// run IS the final compact metric line.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, not another setting —
// exclude it from the unused-key lint
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
