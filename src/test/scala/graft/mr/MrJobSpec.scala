package graft.mr

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** MR-compat facade acceptance: the reference's identity workload
  * (wordcount) must equal the declared q31 result, and the facade's
  * algebraic laws must hold. */
class MrJobSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def texts = Job.of(TestSpark.table("documents").select("text").as[String])

  test("wordcount through the MR facade matches declared q31") {
    val mr = texts
      .flatMap(_.split(" ").toSeq)
      .map(w => (w, 1L))
      .pairs[String, Long]
      .reduceByKey(_ + _)
      .collect()
      .sortBy { case (w, c) => (-c, w) }

    val sql = TestSpark.corpus("q31_wordcount").collect()
      .map(r => (r.getString(0), r.getLong(1)))

    assert(mr.toSeq == sql.toSeq)
  }

  test("map fusion law: job.map(f).map(g) == job.map(g compose f)") {
    val f = (s: String) => s.length
    val g = (n: Int) => n * 2
    val a = texts.map(f).map(g).collect().sorted
    val b = texts.map(f.andThen(g)).collect().sorted
    assert(a.toSeq == b.toSeq)
  }

  test("reduceByKey equals groupReduce fold for an associative op") {
    val pairs = texts.flatMap(_.split(" ").toSeq).map(w => (w.length, 1L)).pairs[Int, Long]
    val reduced = pairs.reduceByKey(_ + _).collect().sortBy(_._1)
    val grouped = pairs.groupReduce((k, it) => Seq((k, it.map(_ => 1L).sum)))
      .collect().sortBy(_._1)
    assert(reduced.toSeq == grouped.toSeq)
  }

  test("sortByKey yields a total order across partitions") {
    val sorted = texts
      .flatMap(_.split(" ").toSeq)
      .map(w => (w, 1L)).pairs[String, Long]
      .reduceByKey(_ + _)
      .sortByKey()
      .collect()
    assert(sorted.map(_._1).toSeq == sorted.map(_._1).sorted.toSeq)
  }

  test("partitionBy picks R and preserves reduce results") {
    val base = texts.flatMap(_.split(" ").toSeq).map(w => (w, 1L)).pairs[String, Long]
    val a = base.reduceByKey(_ + _).collect().sortBy(_._1).toSeq
    val b = base.partitionBy(3).reduceByKey(_ + _).collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("save/read round-trip (R7 sink)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mr").toString + "/wc"
    texts.flatMap(_.split(" ").toSeq).map(w => (w, 1L)).pairs[String, Long]
      .reduceByKey(_ + _).save(dir)
    val back = spark.read.parquet(dir).as[(String, Long)].collect().sortBy(_._1)
    val direct = texts.flatMap(_.split(" ").toSeq).map(w => (w, 1L)).pairs[String, Long]
      .reduceByKey(_ + _).collect().sortBy(_._1)
    assert(back.toSeq == direct.toSeq)
  }

  test("chained jobs stay one plan; materialize() is the explicit barrier") {
    val chained = texts.map(_.toUpperCase).flatMap(_.split(" ").toSeq)
    // One logical plan — no InMemoryRelation anywhere.
    assert(!chained.toDS.queryExecution.optimizedPlan.toString.contains("InMemoryRelation"))
    val barrier = texts.map(_.toUpperCase).materialize().flatMap(_.split(" ").toSeq)
    assert(barrier.toDS.queryExecution.withCachedData.toString.contains("InMemoryRelation"))
  }
}
