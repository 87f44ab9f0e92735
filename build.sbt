ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mapreducehsspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// SpillSpec must stop-and-replace the JVM's SparkContext to apply
// context-level starvation configs; give it a JVM of its own so the
// shared cross-suite session (and anything cached on it) survives.
Test / testGrouping := {
  val forkOpts = (Test / forkOptions).value
  val (isolated, rest) =
    (Test / definedTests).value.partition(_.name == "graft.SpillSpec")
  Seq(
    Tests.Group("main", rest, Tests.SubProcess(forkOpts)),
    Tests.Group("spill-isolated", isolated, Tests.SubProcess(forkOpts)),
  )
}
// One forked test JVM at a time: two concurrent local[4] Spark drivers
// would contend for cores and flake the timing-sensitive specs.
Global / concurrentRestrictions += Tags.limit(Tags.ForkedTestGroup, 1)
// SpeculationSpec runs a local-cluster[2,2,1024] master: real executor
// PROCESSES, spawned by the in-JVM worker from $SPARK_HOME/jars. The
// worker also places executor run-dirs under $SPARK_HOME/work, and
// /opt/spark must stay untouched — so tests see a writable shim home
// (created by the spec: symlinked jars/bin/conf, local work dir).
Test / envVars ++= Map(
  "SPARK_HOME" -> "/tmp/graft-spark-home",
  // normally exported by bin/load-spark-env.sh, which the in-JVM worker
  // bypasses; without it the launcher probes <home>/launcher/target and
  // aborts ("Cannot find any build directories")
  "SPARK_SCALA_VERSION" -> "2.13",
)
run / fork := true
// Pass forked-run output straight through: Bench/Verify print one JSON
// line on stdout that the driver parses; sbt's default LoggedOutput
// would prefix it with "[info] " and break the parse.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // 105 queries x codegen per bench/verify run overflow the default
  // 240m JIT code cache; once full the JVM stops compiling and late
  // queries run interpreted 3-5x slower (and which ones varies run to
  // run). 1g sufficed at ~90 queries; the registry outgrew it (r4: two
  // late-running window queries published 3x their isolated times).
  // Size it for the whole suite with headroom for further growth.
  "-XX:ReservedCodeCacheSize=2g",
)
