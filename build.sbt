ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "newkafkaconsumertohadoophdfsspark"
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
// The driver tails `sbt "runMain graft.Bench"` and parses the ONE JSON
// line Bench prints; sbt's default fork-output strategy relogs the
// forked stdout through its logger as "[info] {...}", which has
// defeated the driver's extractor in EVERY round since r12
// (BENCH_r*.json `parsed: null`, PERF per_query empty — r18 verdict).
// StdoutOutput passes the forked process's stdout/stderr straight
// through, so the JSON line reaches the driver at column 0, bare.
// (Bench additionally mirrors the exact line to a fixed sidecar path —
// see Bench.scala — as the belt-and-braces copy.)
outputStrategy := Some(OutputStrategy.StdoutOutput)
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
// filter(_.nonEmpty): an empty or whitespace-padded SPARK_GRAFT_JAVA_OPTS
// would otherwise contribute empty-string fork arguments, which make the
// forked java fail with "Could not find or load main class"
) ++ sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq
  .flatMap(_.split("\\s+").toSeq).filter(_.nonEmpty)
