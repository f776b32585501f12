ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "fluentbitfiltermathspark"
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
// The ContextCleaner periodic GC (GraftSession: 1min) calls
// System.gc(), which under G1 is a stop-the-world FULL collection —
// multi-second on a 64 GB heap, landing on whichever query straddles
// the tick (measured at sf1/64 GB: scattered 3-11x medians, e.g.
// q89 12.6 s vs 1.1 s, with no plan difference). Concurrent explicit
// GC keeps the ref-drain benefit without the pause. EXCEPTION: a
// sweep that will launch fresh-JVM isolated controls must be able to
// UNCOMMIT its retired heap before the children start — only a
// compacting STW full GC returns committed pages to the OS (the
// round-12 sf10 sweep died to the host OOM killer: the 64 GB parent
// stayed at 66 GB RSS through its concurrent "full" GC while a 64 GB
// child ran). SPARK_GRAFT_STW_EXPLICIT_GC=1 drops the flag for such
// runs; the 30-min cleaner cadence used at sweep scale makes the
// resulting STW ticks rare, and the regression-control machinery
// adjudicates any row one lands on.
javaOptions ++= (
  if (sys.env.get("SPARK_GRAFT_STW_EXPLICIT_GC").contains("1")) Seq.empty
  else Seq("-XX:+ExplicitGCInvokesConcurrent"))
scalacOptions ++= Seq("-deprecation")
