ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "digaggregatorcorespark"
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
// Bench/Verify emit line-oriented JSON the harness parses from stdout;
// sbt's logger would prefix every forked-run line with "[info] " and
// break that parse, so route the forked process's output straight
// through. (Test output keeps the default logged strategy.)
Compile / run / outputStrategy := Some(StdoutOutput)
Compile / runMain / outputStrategy := Some(StdoutOutput)
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
  // JIT code cache (JDK 17 default 240m). A long bench suite generates
  // thousands of codegen classes; at 240m the cache saturates mid-suite
  // and iterative queries run partially deoptimized (SCALE.md: g1 at sf1
  // 13.97 s in-suite vs 5.70 s solo at 240m; 6.27 s in-suite at 1g —
  // suite ≡ solo once the cache fits). 1g is reserved address space,
  // committed only as generated code actually fills it.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_CODE_CACHE", "1g")}",
)
