package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The custom-state sessionizer must agree with (a) its batch twin and
  * (b) the declared q37 sessionization, with the trailing sessions flushed
  * by event-time timeout once the watermark moves past them. */
class StatefulSessionizerSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val gapMs = 30L * 60 * 1000

  private def eventRows: Seq[SessionEvent] =
    TestSpark.table("events")
      .select(col("user_id"), col("ts").cast(TimestampType).as("ts"))
      .as[SessionEvent].collect().toSeq.sortBy(_.ts.getTime)

  test("streaming sessions (flatMapGroupsWithState) equal the batch twin and q37") {
    val rows = eventRows
    val mem = MemoryStream[SessionEvent]
    val q = StatefulSessionizer.sessions(
        StreamOps.withEventTime(mem.toDF(), "0 seconds").as[SessionEvent], gapMs)
      .writeStream.format("memory").queryName("t_statesess").outputMode("append").start()
    try {
      rows.grouped(rows.size / 3 + 1).foreach { b =>
        mem.addData(b); q.processAllAvailable()
      }
      // Watermark-advancing sentinel: pushes event time far forward so every
      // open session's timeout fires and flushes.
      val far = new Timestamp(rows.last.ts.getTime + 365L * 24 * 3600 * 1000)
      mem.addData(Seq(SessionEvent(-1L, far)))
      q.processAllAvailable()

      val streamed = spark.table("t_statesess").as[Session].collect()
        .filter(_.user_id >= 0)
      val batch = StatefulSessionizer.batchSessions(
        spark.createDataset(rows), gapMs).collect()

      def key(s: Session) = (s.user_id, s.start.getTime, s.end.getTime, s.n_events)
      assert(streamed.map(key).toSet == batch.map(key).toSet)

      val q37 = TestSpark.corpus("q37_sessionize")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val perUser = streamed.groupBy(_.user_id).view.mapValues(_.length.toLong).toMap
      assert(perUser == q37)
    } finally q.stop()
  }

  test("batch twin conserves events and respects the gap invariant") {
    val rows = eventRows
    val sessions = StatefulSessionizer.batchSessions(spark.createDataset(rows), gapMs).collect()
    assert(sessions.map(_.n_events).sum == rows.size)
    assert(sessions.forall(s => s.start.getTime <= s.end.getTime))
    // No two sessions of one user closer than the gap.
    sessions.groupBy(_.user_id).values.foreach { ss =>
      val sorted = ss.sortBy(_.start.getTime)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b.start.getTime - a.end.getTime > gapMs)
        case _           =>
      }
    }
  }
}
