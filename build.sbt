ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "procoggraphspark"
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
// The bench/verify mains print machine-readable JSON lines the driver
// parses from a bounded stdout tail; sbt's default LoggedOutput wraps
// every forked-process line in "[info] ", which breaks a strict
// line-oriented JSON parser (BENCH_r10–r13: parsed=null). StdoutOutput
// passes the forked JVM's stdout/stderr through verbatim.
run / outputStrategy := Some(StdoutOutput)
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
  // 16g default on the 128 GiB bench host: at sf0.1 the 8g default spent
  // 193 executor-GC-seconds inside etl3 alone (BENCH_r11 exec entry) —
  // 32 task threads' hash-agg pages + the persisted registry + ~70 gzip
  // sink buffers churned a heap sized for laptops. SPARK_DRIVER_MEM
  // still overrides both ways (the round-8 4g pressure-repro uses it).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
