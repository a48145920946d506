package graft.mr

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Graft

/** R9 (fault tolerance): the framework, not the user, re-runs failed
  * tasks. Task retry in local mode is baked into the master string
  * (`local[N, maxFailures]`) at context creation, so this suite runs in
  * its OWN forked JVM (build.sbt Test/testGrouping) with a dedicated
  * `local[4, 2]` session — every other suite keeps the strict
  * maxFailures = 1 default, where a genuinely flaky task fails the test
  * instead of being silently retried. */
class FaultToleranceSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = Graft.session("graft-retry-test", master = "local[4, 2]")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    graft.sources.Catalog.register(s, "/root/testdata/sf0.001")
    s
  }

  test("R9: a transiently-failing task is retried by the framework; results exact") {
    import spark.implicits._
    val texts = Job.of(spark.table("documents").select("text").as[String])
    // Inject a failure on the FIRST attempt of partition 0 only
    // (TaskContext.attemptNumber) — maxFailures = 2, so the retry
    // succeeds and the job's result must equal the failure-free run
    // exactly.
    def wordcount(src: Job[String]) = src
      .flatMap(_.split(" ").toSeq)
      .map(w => (w, 1L))
      .pairs[String, Long]
      .reduceByKey(_ + _)
      .collect().sortBy(_._1).toSeq
    val expect = wordcount(texts)
    val flaky = texts.mapPartitions { it =>
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0)
        throw new RuntimeException("transient failure (spec-injected, retried)")
      it
    }
    assert(wordcount(flaky) == expect && expect.nonEmpty)
  }
}
