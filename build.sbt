ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hpccplatformspark"
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
// Bench/Verify print a machine-read JSON line as their final output; sbt's
// "[success] Total time" epilogue would otherwise be the last line the
// driver sees and break its parse.
showSuccess := false
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // 80+ codegen'd queries in one JVM overflow the default 240m code cache,
  // silently disabling the JIT — CPU-bound stages then run interpreted.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
  // 80+ queries enqueue hundreds of generated classes for compilation; with
  // few compiler threads the queue backs up and hot loops run interpreted
  // (25× observed). More C1/C2 threads drain the queue promptly.
  "-XX:CICompilerCount=12",
  // Embedded Derby (JDBC specs) writes its error log to CWD by default;
  // keep the repo root clean after a full test/bench run. Same for the
  // session catalog's warehouse dir (bucketed tables use explicit paths;
  // only the empty default dir would otherwise appear at the root).
  "-Dderby.stream.error.file=target/derby.log",
  "-Dspark.sql.warehouse.dir=target/spark-warehouse",
)
