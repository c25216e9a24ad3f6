ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pdfusinghuggingfaceandvectordatabasespark"
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
// Raw pass-through of the forked program's stdout: Bench's one-line JSON
// must not be wrapped with sbt's "[info] " logger prefix (the driver
// json-parses the line verbatim).
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
  // Measured on the sf0.1 bench: 8-16g heaps all run ~43s; 32g+ runs
  // 60s+ because G1 lets garbage accumulate into long pauses that stall
  // random 32-thread stages. 12g = near-optimal + headroom.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  // throughput-oriented batch JVM: ParallelGC measured slightly ahead of
  // G1 on the sf0.1 bench and with less run-to-run variance
  sys.env.getOrElse("SPARK_GC_OPT", "-XX:+UseParallelGC"),
)
