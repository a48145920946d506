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

  test("bigram counting via CHAINED jobs (R8) hash-matches declared q32") {
    // The classic two-job MR chain: job 1 is a wordcount over bigrams
    // (flatMap emit + combiner-backed reduce), job 2 re-keys by
    // (count desc, bigram) for the global ordering — with an explicit
    // materialize() barrier between them, the R8 idiom.
    val counted = texts
      .flatMap(_.split(" ").toSeq.sliding(2).filter(_.size == 2)
        .map(_.mkString(" ")).toSeq)
      .map(bg => (bg, 1L))
      .pairs[String, Long]
      .reduceByKey(_ + _)
      .toDS.toDF("bg", "c")
    val top = graft.mr.Job.of(counted.as[(String, Long)])
      .materialize()
      .map { case (bg, c) => ((-c, bg), c) }
      .pairs[(Long, String), Long]
      .sortByKey()
      .map { case ((_, bg), c) => (bg, c) }
      .toDS.limit(50).toDF("bg", "c")
    assert(graft.verify.Canon.hashOf(top) ==
      graft.verify.Canon.hashOf(TestSpark.corpus("q32_bigrams")))
  }

  test("length histogram with an associative combine (R3) hash-matches declared q64") {
    // One MR pass: map each doc to (bucket, (count, min, max)); the
    // associative merge runs MAP-SIDE first (the automatic combiner), so
    // the shuffle carries one triple per (partition, bucket), not one
    // per document.
    val hist = texts
      // Code-POINT length: SQL length() counts code points (UTF8String
      // numChars) while String.length counts UTF-16 units — the fixture
      // contains astral characters, so the two disagree.
      .map { t => val len = t.codePointCount(0, t.length); (len / 100L, (1L, len, len)) }
      .pairs[Long, (Long, Int, Int)]
      .reduceByKey { case ((c1, mn1, mx1), (c2, mn2, mx2)) =>
        (c1 + c2, math.min(mn1, mn2), math.max(mx1, mx2)) }
      .sortByKey() // hashOf is order-sensitive; q64 orders by bucket (R6)
      .toDS
      .map { case (b, (c, mn, mx)) => (b, c, mn, mx) }
      .toDF("bucket", "c", "mn", "mx")
    assert(graft.verify.Canon.hashOf(hist) ==
      graft.verify.Canon.hashOf(TestSpark.corpus("q64_length_histogram")))
  }

  // R9 (fault tolerance) lives in FaultToleranceSpec: task retry needs a
  // local[4, 2] master, which this shared strict-mode session must not use.

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

  test("secondary sort: reducer sees values ordered by the sort key, result matches a window plan") {
    import org.apache.spark.sql.functions._
    // Per-user event-type sequence in time order — the canonical
    // secondary-sort workload (sessionization input shape).
    val events = TestSpark.table("events")
      .select(col("user_id"), unix_micros(col("ts").cast(org.apache.spark.sql.types.TimestampType)).as("t"), col("event_type"))
      .as[(Long, Long, String)]
    val mr = Job.of(events)
      .keyBy(_._1)
      .groupReduceSorted(v => (v._2, v._3)) { (user, vs) =>
        var last = Option.empty[(Long, String)]
        val sb = new StringBuilder
        vs.foreach { case (_, t, et) =>
          assert(last.forall(l => Ordering[(Long, String)].lteq(l, (t, et))),
            "values not sorted")
          last = Some((t, et)); if (sb.nonEmpty) sb += ','; sb ++= et
        }
        Iterator((user, sb.result()))
      }
      .collect().toMap
    val expected = TestSpark.table("events")
      .select(col("user_id"), unix_micros(col("ts").cast(org.apache.spark.sql.types.TimestampType)).as("t"), col("event_type"))
      .withColumn("seq", collect_list(col("event_type")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy("t", "event_type")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)))
      .groupBy("user_id").agg(first("seq").as("seq"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).mkString(",")).toMap
    assert(mr == expected && mr.nonEmpty)
  }

  test("secondary sort: early-exit reducers do not corrupt the next key's run") {
    val data = Seq((1L, 30L, "c"), (1L, 10L, "a"), (1L, 20L, "b"),
                   (2L, 2L, "y"), (2L, 1L, "x")).toDF("k", "t", "v")
      .as[(Long, Long, String)]
    // f consumes only the FIRST value per key (min by sort key) — the
    // facade must drain the rest of the run before starting the next key.
    val firsts = Job.of(data).keyBy(_._1)
      .groupReduceSorted(v => v._2) { (k, vs) => Iterator((k, vs.next()._3)) }
      .collect().toMap
    assert(firsts == Map(1L -> "a", 2L -> "x"))
  }

  test("secondary sort: Array[Byte] keys form ONE run per key (value equality, not reference)") {
    // Binary digests are natural MR keys; `==` on JVM arrays is
    // referential, which would split every key into per-row runs and
    // invoke the reducer once per ROW instead of once per key.
    val data = Seq((Array[Byte](1, 2), 20L, "b"), (Array[Byte](1, 2), 10L, "a"),
                   (Array[Byte](3), 1L, "x"), (Array[Byte](3), 2L, "y"))
      .toDF("k", "t", "v").as[(Array[Byte], Long, String)]
    val runs = Job.of(data).keyBy(_._1)
      .groupReduceSorted(v => v._2) { (k, vs) =>
        Iterator((k.toSeq.mkString(":"), vs.map(_._3).mkString(",")))
      }
      .collect().toSeq.sortBy(_._1)
    assert(runs == Seq("1:2" -> "a,b", "3" -> "x,y"))
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
