ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "rdbmsscalaspark"
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
  // 32g default (was 8g through round 13): the single-JVM local[32]
  // driver hosts ALL executor storage+execution memory, and at 8g the
  // 22-query tpch22 / 28-query llm sweeps evicted each other's cached
  // tables and churned GC (ss20's recurring 150ms+ rep flags). Measured
  // same-day A/B at sf0.1 (round 14): headline 4.81s median/4.34 min at
  // 8g -> 4.09/3.83 at 32g, llm_total 18.7 -> 17.2, ss20 3.45 -> 2.87,
  // zero stall flags. The box has 128 GiB; -Xmx is a cap, so tests and
  // small runs are unaffected. At cluster scale this is the ordinary
  // "size executor memory so the working set fits" rule (SCALE.md).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // Pin the JVM locale like the TZ: Bench/RewriteAb/ScaleCurve write JSON
  // artifacts via f"...%.4f", which formats with the DEFAULT locale — on a
  // comma-decimal host that emits "1,4032" and breaks every JSON consumer.
  "-Duser.language=en", "-Duser.country=US",
)
