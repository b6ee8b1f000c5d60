ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "systemsspark"
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
  // 48g default: at 16g a 75+-query bench run accumulated enough heap
  // debt (broadcasts, codegen classes, MLlib internals) that G1 thrashed
  // during the heaviest late-alphabet query — pipeline_recsys swung
  // 13s/31s/66s across identical runs; at 48g it is a stable ~12s.
  // (8g was worse still: multi-second pauses on every training query.)
  // The box has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // A 90-query bench run compiles thousands of generated classes; the
  // JVM default ~240m code cache can fill mid-run, at which point the
  // JIT silently stops compiling and late-alphabet queries run partly
  // interpreted — a 2-3x slowdown that looks exactly like the r3
  // pipeline_curation 30.5s-vs-9.9s-isolated contamination.
  "-XX:ReservedCodeCacheSize=512m",
)
