ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "metricsspark"
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
  // 48g default: local[32] runs at sf0.1 need headroom for the cached
  // dedup intermediates + 32 concurrent task buffers (the container has
  // 128 GiB; -Xmx is a cap, not a reservation)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // pre-sized initial heap: keeps G1 from stepwise regrowth and bounds
  // the first-touch fault tax this VM charges to whichever query grows
  // the heap (~15 MB/s/thread fault path). THP was A/B-tested and
  // REJECTED here: it speeds first-touch 5x but its fault-time
  // compaction stalls cost the allocation-heavy dedup pipeline ~2x
  // (dedup_cluster_sizes 8.8 s without THP vs ~20 s with, full-bench
  // totals 66 s vs 78 s on the optimized code).
  "-Xms8g",
)
