ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "flinkstreamingetlspark"
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
// Driver-verifiable FAST test tier (r13 VERDICT #7): the full suite's
// multi-batch streaming/CDC replays and stress suites run ~80 minutes —
// past the driver's test budget, so a green tree still read tests_ok
// false. Plain `sbt test` now runs the fast tier: every operator-family
// suite (operators/, functions/, engine/plan/dialect/invariance) plus
// representative streaming rails, targeting < 10 min. The FULL suite is
// one flag away and stays the builder's round-close gate:
//   GRAFT_FULL_TESTS=1 sbt test
val fastTierKeep: String => Boolean = { n =>
  val slowPackages =
    n.startsWith("graft.streaming.") || n.startsWith("graft.cdc.")
  val slowSuites = Set(
    "graft.ScaleGrowthSpec", "graft.SkewStressSpec",
    "graft.functions.PublicSuffixScaleSpec",
    "graft.sources.KafkaCdcSpec", "graft.sources.KeyedReplaySpec",
    "graft.sources.JdbcSpec")
  // representative streaming rails kept in the fast tier: the keyed
  // state store, the IncrementalAgg ± rails, and the exact-dedup ladder
  val streamingReps = Set(
    "graft.streaming.ParquetKeyedTableSpec",
    "graft.streaming.StreamingEntropySpec",
    "graft.streaming.StreamingExactDedupSpec")
  streamingReps(n) || (!slowPackages && !slowSuites(n))
}
Test / testOptions ++= {
  if (sys.env.contains("GRAFT_FULL_TESTS")) Seq.empty
  else Seq(Tests.Filter(fastTierKeep))
}
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
  // Derby (JdbcSpec's embedded server) writes its log relative to CWD;
  // route it under target/ so `git status` stays clean for the driver's
  // artifact diffing (r10 VERDICT #9)
  "-Dderby.stream.error.file=target/derby.log",
  // 12g default: the composed-pipeline streaming suite's replay test sat
  // at the 8g broadcast-memory edge and failed intermittently with
  // "Not enough memory to build and broadcast" (driver-heap accumulation
  // across a suite JVM's many micro-batch broadcasts; host has 125G)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
)
