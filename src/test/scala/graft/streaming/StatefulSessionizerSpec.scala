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

  test("late in-watermark events replay like batch: merge backwards or form their own session") {
    // Batch 1 opens a session at 12:00; batch 2 delivers a LATE 09:00 event
    // (well inside the watermark) plus 12:05. A naive `t - last <= gap`
    // check would swallow 09:00 into the 12:00 session (negative delta);
    // the correct replay forms a disjoint 09:00 singleton and merges 12:05.
    def t(h: Int, m: Int) = new Timestamp(
      java.time.LocalDateTime.of(2024, 6, 1, h, m).toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
    val all = Seq(SessionEvent(7L, t(12, 0)), SessionEvent(7L, t(9, 0)), SessionEvent(7L, t(12, 5)))
    val mem = MemoryStream[SessionEvent]
    val q = StatefulSessionizer.sessions(
        StreamOps.withEventTime(mem.toDF(), "2 days").as[SessionEvent], gapMs)
      .writeStream.format("memory").queryName("t_latesess").outputMode("append").start()
    try {
      mem.addData(Seq(all.head)); q.processAllAvailable()
      mem.addData(all.tail); q.processAllAvailable()
      mem.addData(Seq(SessionEvent(-1L, new Timestamp(t(12, 5).getTime + 30L * 24 * 3600 * 1000))))
      q.processAllAvailable()
      val streamed = spark.table("t_latesess").as[Session].collect()
        .filter(_.user_id >= 0)
      val batch = StatefulSessionizer.batchSessions(
        spark.createDataset(all), gapMs).collect()
      def key(s: Session) = (s.user_id, s.start.getTime, s.end.getTime, s.n_events)
      assert(streamed.map(key).toSet == batch.map(key).toSet)
      assert(batch.map(key).toSet == Set(
        (7L, t(9, 0).getTime, t(9, 0).getTime, 1L),
        (7L, t(12, 0).getTime, t(12, 5).getTime, 2L)))
    } finally q.stop()
  }

  test("a late event within gap of an earlier-batch session merges, not splits") {
    // Batch 1 = {10:00, 12:00}: the 10:00 session sorts before the open
    // 12:00 one, but its end is still inside the watermark — it must be
    // HELD, not emitted. Batch 2 delivers a late 10:03 (within gap of
    // 10:00): batch replay merges them into [10:00..10:03]×2. The round-3
    // early-emit would have already emitted [10:00]×1 and turned 10:03
    // into a spurious singleton.
    def t(h: Int, m: Int) = new Timestamp(
      java.time.LocalDateTime.of(2024, 6, 1, h, m).toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
    val all = Seq(SessionEvent(9L, t(10, 0)), SessionEvent(9L, t(12, 0)), SessionEvent(9L, t(10, 3)))
    val mem = MemoryStream[SessionEvent]
    val q = StatefulSessionizer.sessions(
        StreamOps.withEventTime(mem.toDF(), "2 days").as[SessionEvent], gapMs)
      .writeStream.format("memory").queryName("t_heldsess").outputMode("append").start()
    try {
      mem.addData(all.take(2)); q.processAllAvailable()
      mem.addData(Seq(all(2))); q.processAllAvailable()
      mem.addData(Seq(SessionEvent(-1L, new Timestamp(t(12, 0).getTime + 30L * 24 * 3600 * 1000))))
      q.processAllAvailable()
      val streamed = spark.table("t_heldsess").as[Session].collect()
        .filter(_.user_id >= 0)
      val batch = StatefulSessionizer.batchSessions(
        spark.createDataset(all), gapMs).collect()
      def key(s: Session) = (s.user_id, s.start.getTime, s.end.getTime, s.n_events)
      assert(streamed.map(key).toSet == batch.map(key).toSet)
      assert(batch.map(key).toSet == Set(
        (9L, t(10, 0).getTime, t(10, 3).getTime, 2L),
        (9L, t(12, 0).getTime, t(12, 0).getTime, 1L)))
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
