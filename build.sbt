ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "jsmrspark"
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
// FaultToleranceSpec needs task retry, which local mode bakes into the
// master string at context creation (local[4, 2]) — one context per JVM,
// so that suite gets its OWN forked JVM while every other suite shares
// the strict maxFailures=1 session. Distinct derby/warehouse dirs keep
// the two JVMs from fighting over the metastore lock.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
  val retryOpts = opts.filterNot(o =>
    o.startsWith("-Dspark.sql.warehouse.dir=") || o.startsWith("-Dderby.system.home=")) ++
    Vector("-Dspark.sql.warehouse.dir=/tmp/graft-warehouse-retry",
           "-Dderby.system.home=/tmp/graft-derby-retry")
  val (retry, rest) = tests.partition(_.name.endsWith("FaultToleranceSpec"))
  Seq(
    Tests.Group("retry", retry,
      Tests.SubProcess(ForkOptions().withRunJVMOptions(retryOpts))),
    Tests.Group("main", rest,
      Tests.SubProcess(ForkOptions().withRunJVMOptions(opts))))
}
// One forked test JVM at a time: both groups read the same fixture dirs
// and the host's 32 cores are already sized for a single 4-thread session.
Test / concurrentRestrictions := Seq(Tags.limit(Tags.ForkedTestGroup, 1))
// Pass forked-run output straight through (no [info]/[error] log prefixes):
// the bench/verify harness parses raw JSON lines from stdout.
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
  // Managed-table warehouse (bucketed-join tests) outside the repo tree:
  "-Dspark.sql.warehouse.dir=/tmp/graft-warehouse",
  "-Dderby.system.home=/tmp/graft-derby",
  // local[32] = driver-only JVM; generous heap (machine has 128 GiB)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
