ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "outpostspark"
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
// The bench/verify contract is "print ONE JSON line": with sbt's default
// LoggedOutput every forked-process line is re-logged as "[info] <line>",
// which is not valid JSON — route the forked run's stdio through unchanged.
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
  // local[32] shares one unified memory pool across 32 task slots; 8g
  // starved the storage fraction under the bench's persisted dedup
  // intermediates (measured eviction churn). The sandbox has 125 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Catalyst's recursive tree transforms overflow the 1 MB default stack
  // on a session that has planned a full bench run's worth of queries
  // (observed: StackOverflowError in the point-lookup section at the end
  // of a 47-query pass); Spark's own docs recommend a larger driver
  // thread stack for deep plans.
  "-Xss16m",
)
// Tests run on a DST-shifting, negative-offset host timezone on purpose:
// operators must be timezone-independent (explicit-UTC field arithmetic),
// and a UTC test JVM would mask any regression that sneaks host-TZ
// dependence back in. TimezoneIndependenceSpec additionally flips the
// SESSION timezone; this flips the JVM default.
Test / javaOptions += "-Duser.timezone=America/New_York"
