ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "osmapreduceprojectspark"
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
// r16 (verdict task 4): the 91-suite suite ran sequentially in ONE forked
// JVM (17-22 min wall). Suites are parallelized by FORKED GROUP — each
// group is its own JVM with its own SparkSession and its own copy of every
// JVM-global registry (Io's block accounting, the shared test session's
// SQLConf), so the shared-state discipline inside a group stays exactly
// what sequential execution always guaranteed, while groups overlap on the
// 32-core box. Known-heavy suites are pinned first so they land in
// distinct groups (the longest pole sets the wall clock).
val testGroupCount = 6
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value
    // one sequential 91-suite JVM needed 24g; a ~15-suite group does not
    .filterNot(_.startsWith("-Xmx")) :+ "-Xmx12g"
  val heavy = Seq("graft.StreamingSpec", "graft.PlanShapeSpec",
    "graft.QueriesSmokeSpec", "graft.ExtensionsIoSpec", "graft.SkewSpec",
    "graft.PropertiesSpec")
  val ordered = tests.sortBy(t =>
    (heavy.indexOf(t.name) match { case -1 => heavy.size; case i => i },
      t.name))
  ordered.zipWithIndex.groupBy(_._2 % testGroupCount).toSeq.sortBy(_._1)
    .map { case (i, ts) =>
      Tests.Group(s"g$i", ts.map(_._1),
        Tests.SubProcess(ForkOptions().withRunJVMOptions(opts.toVector)))
    }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testGroupCount),
  Tags.limitAll(testGroupCount + 2))
// Forked JVM writes straight to the console (no sbt log-level routing) so
// Bench's single JSON stdout line survives `sbt --error "runMain ..."`.
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
  // 24g default: the box has 128 GiB; at local[32] the window/sort stages
  // spill under an 8g heap, and GC pauses inflate the per-query floor
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
