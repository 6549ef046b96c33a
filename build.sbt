ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sparks3shufflespark"
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
// The driver scrapes Bench's one-line JSON from the last 2000 bytes of
// combined output. sbt's default LoggedOutput prefixes every forked
// stdout line with "[info] ", which breaks the driver's per-line JSON
// parse (BENCH_r06.json "parsed": null — the only complete line in the
// tail carried the prefix). StdoutOutput passes the forked JVM's streams
// through raw.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// local-cluster tests spawn executor JVMs through the in-JVM launcher,
// which resolves the Scala suffix from this env var when the shell
// scripts (which normally export it) are bypassed.
Test / envVars += "SPARK_SCALA_VERSION" -> "2.13"

// ---- style gate ----
// The reference's CI runs `scalafmtCheckAll` on every build
// (.github/workflows/ci.yml); this sandbox's offline coursier cache has no
// scalafmt artifacts, so this task is the cheap in-sandbox equivalent: the
// mechanical hygiene rules a formatter enforces (tabs, trailing
// whitespace, CRLF, 120-char lines, final newline), wired so `sbt test`
// fails on drift.
lazy val styleCheck = taskKey[Unit](
  "fail on tabs / trailing whitespace / CRLF / >120-char lines / missing final newline")
styleCheck := {
  val log = streams.value.log
  val files = ((baseDirectory.value / "src") ** "*.scala").get()
  val bad = files.flatMap { f =>
    val s = IO.read(f, java.nio.charset.StandardCharsets.UTF_8)
    val issues = scala.collection.mutable.Buffer[String]()
    s.split("\n", -1).zipWithIndex.foreach { case (raw, i) =>
      val crlf = raw.endsWith("\r")
      val l = if (crlf) raw.dropRight(1) else raw
      if (crlf) issues += s"$f:${i + 1}: CRLF line ending"
      if (l.contains('\t')) issues += s"$f:${i + 1}: tab character"
      if (l != l.replaceAll("\\s+$", ""))
        issues += s"$f:${i + 1}: trailing whitespace"
      if (l.length > 120)
        issues += s"$f:${i + 1}: line longer than 120 chars (${l.length})"
    }
    if (s.nonEmpty && !s.endsWith("\n")) issues += s"$f: missing final newline"
    issues
  }
  if (bad.nonEmpty) {
    bad.foreach(m => log.error(m))
    sys.error(s"styleCheck: ${bad.size} violation(s)")
  } else log.info(s"styleCheck: ${files.size} files clean")
}
Test / test := ((Test / test) dependsOn styleCheck).value
