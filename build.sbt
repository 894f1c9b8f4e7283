ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "earthwyrmspark"
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
// The driver's bench gate parses the LAST stdout line as JSON. sbt's
// default LoggedOutput frames forked output with "[info] " and appends
// "[success] Total time: ..." after it — both corrupted the round-1/2
// BENCH records (parsed:null). StdoutOutput passes the forked JVM's
// stdout through verbatim (its stderr goes to real stderr, keeping Spark
// log noise out of stdout); showSuccess drops the trailing banner.
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
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
  // measured: ParallelGC cuts aggregate task time ~15% vs G1 on the
  // allocation-heavy encode+shuffle stages (local[N] batch profile);
  // a large FIXED young gen on top of it kills the multi-core GC-wall
  // pathology adaptive sizing produced (7-30 s collection walls at
  // width ≥4 vs 0.2 s serial on identical allocation — tile payloads
  // are short-lived and must never promote)
  "-XX:+UseParallelGC",
  s"-Xmn${sys.env.getOrElse("SPARK_GRAFT_YOUNG", "5g")}",
  "-XX:-UseAdaptiveSizePolicy",
) ++ sys.env.get("SPARK_GRAFT_JAVA_OPTS")
  .map(_.split(" ").toSeq).getOrElse(Seq.empty)
