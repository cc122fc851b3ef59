ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sqlppspark"
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
// Forked run/runMain output goes straight to stdout UNPREFIXED: the
// bench driver captures a tail of stdout and parses the compact JSON
// line out of it — sbt's default logger strategy prepends "[info] "
// to every forked line, which defeats that parser. Unscoped so both
// `run` and `runMain` (and test forks) inherit it.
outputStrategy := Some(StdoutOutput)
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
) ++ Seq("graft.fuzz.n", "graft.fuzz.dml.n", "graft.fuzz.comp.n") // soak knobs: sbt JVM -> forked JVM
  .flatMap(k => sys.props.get(k).map(v => s"-D$k=$v"))

// Build-time static-query validation (the reference PPX's compile
// gate, re-expressed): analyzes every StaticQueries.registry entry
// against the declared schema and fails on any parse/scope/type
// error. Run `sbt validateQueries` in CI before shipping.
lazy val validateQueries = taskKey[Unit](
  "analyze all statically embedded queries; fail the build on errors")
// The task also regenerates the typed-row case classes
// (src/main/scala/graft/generated/Rows.scala) from the analyzer's
// inferred row types and fails on drift — the decoder layer the
// reference PPX generates at compile time.
validateQueries := {
  val cp = (Compile / fullClasspath).value
  val r = (Compile / runner).value
  r.run("graft.StaticQueries", cp.files,
    Seq("src/main/scala/graft/generated/Rows.scala"), streams.value.log).get
}
