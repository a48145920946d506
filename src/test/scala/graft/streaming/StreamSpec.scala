package graft.streaming

import java.time.LocalDateTime

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

final case class Ev(event_id: Long, user_id: Long, event_type: String,
                    value: Double, ts: LocalDateTime)

/** Replay-equivalence: each StreamOps operator, fed the batch rows through
  * a MemoryStream in event-time order, must converge to the operator's
  * batch result; plus watermark late-data semantics on hand-built
  * micro-batches (SURVEY.md §2.6). */
class StreamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def eventRows: Seq[Ev] =
    TestSpark.table("events")
      .selectExpr("event_id", "user_id", "event_type", "value", "ts")
      .as[Ev].collect().toSeq.sortBy(_.ts.toString)

  /** Run `op` over a memory stream fed `rows` in `chunks` batches
    * (complete mode), return the final sink table rows. */
  private def replay(rows: Seq[Ev], chunks: Int, name: String)
                    (op: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Seq[Row] = {
    val mem = MemoryStream[Ev]
    val q: StreamingQuery = op(mem.toDF())
      .writeStream.format("memory").queryName(name).outputMode("complete").start()
    try {
      rows.grouped(math.max(1, rows.size / chunks + 1)).foreach { batch =>
        mem.addData(batch)
        q.processAllAvailable()
      }
      spark.table(name).collect().toSeq
    } finally q.stop()
  }

  private def canon(rows: Seq[Row]): Seq[String] =
    rows.map(r => graft.verify.Canon.canonRow(r)).sorted

  test("tumbling window agg: stream replay equals batch") {
    val batch = canon(StreamOps.tumblingAgg(TestSpark.table("events")).collect().toSeq)
    val stream = canon(replay(eventRows, 3, "t_tumble")(StreamOps.tumblingAgg(_)))
    assert(stream == batch)
  }

  test("sliding window agg: stream replay equals batch") {
    val batch = canon(StreamOps.slidingAgg(TestSpark.table("events")).collect().toSeq)
    val stream = canon(replay(eventRows, 3, "t_slide")(StreamOps.slidingAgg(_)))
    assert(stream == batch)
  }

  test("session windows: stream replay equals batch") {
    val batch = canon(StreamOps.sessionAgg(TestSpark.table("events")).collect().toSeq)
    val stream = canon(replay(eventRows, 3, "t_sess")(StreamOps.sessionAgg(_)))
    assert(stream == batch)
  }

  test("sessions-per-user rollup matches the declared q37 sessionization") {
    val viaSessionWindow = StreamOps.sessionsPerUser(TestSpark.table("events"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val q37 = TestSpark.corpus("q37_sessionize")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaSessionWindow == q37)
  }

  test("watermark drops data later than the allowed lateness (append mode)") {
    val t0 = LocalDateTime.of(2024, 1, 1, 0, 0, 0)
    val mem = MemoryStream[Ev]
    val q = StreamOps.tumblingAgg(
        StreamOps.withEventTime(mem.toDF(), "10 minutes"))
      .writeStream.format("memory").queryName("t_late").outputMode("append").start()
    try {
      // Batch 1: two events in hour 0, one in hour 2 — watermark advances
      // to 02:00 - 10min, sealing hour 0 and emitting its window.
      mem.addData(Seq(
        Ev(1, 1, "click", 1.0, t0.plusMinutes(5)),
        Ev(2, 1, "click", 1.0, t0.plusMinutes(20)),
        Ev(3, 1, "click", 1.0, t0.plusHours(2))))
      q.processAllAvailable()
      // Batch 2: a straggler for hour 0, far behind the watermark → dropped.
      mem.addData(Seq(Ev(4, 1, "click", 99.0, t0.plusMinutes(30))))
      q.processAllAvailable()
      mem.addData(Seq(Ev(5, 1, "click", 1.0, t0.plusHours(4))))
      q.processAllAvailable()
      val hour0 = spark.table("t_late").collect()
        .filter(r => graft.verify.Canon.canonVal(r.getStruct(0).get(0))
          .startsWith("2024-01-01 00:00:00"))
      assert(hour0.length == 1)
      assert(hour0.head.getLong(2) == 2, "late straggler was not dropped")
    } finally q.stop()
  }

  test("stream-static join enriches the stream with a broadcastable dim") {
    val rows = eventRows.take(60)
    val dim = TestSpark.table("customer")
      .selectExpr("c_custkey as user_id", "c_mktsegment")
    val mem = MemoryStream[Ev]
    val q = mem.toDF().join(dim, Seq("user_id"), "left")
      .writeStream.format("memory").queryName("t_enrich").outputMode("append").start()
    try {
      mem.addData(rows)
      q.processAllAvailable()
      val streamed = spark.table("t_enrich").count()
      assert(streamed == rows.size, "left join must preserve stream cardinality")
      val enriched = spark.table("t_enrich").where("c_mktsegment is not null").count()
      val expected = spark.createDataset(rows).toDF().join(dim, Seq("user_id"))
        .count()
      assert(enriched == expected)
    } finally q.stop()
  }

  test("stream-stream band join: replay equals the batch band join (q14 shape)") {
    val rows = eventRows
    val clicks = rows.filter(_.event_type == "click")
    val purchases = rows.filter(_.event_type == "purchase")
    val memC = MemoryStream[Ev]
    val memP = MemoryStream[Ev]
    def prep(df: org.apache.spark.sql.DataFrame) =
      StreamOps.withEventTime(df.selectExpr("event_id", "user_id", "ts"), "1 day")
    val q = StreamOps.bandJoin(prep(memC.toDF()), prep(memP.toDF()),
        key = "user_id", bandSeconds = 300)
      .select("l_event_id", "r_event_id")
      .writeStream.format("memory").queryName("t_ssjoin").outputMode("append").start()
    try {
      // Two batches per side, event-time order: join state must carry
      // cross-batch pairs (click in batch 1, purchase in batch 2).
      memC.addData(clicks.take(clicks.size / 2)); memP.addData(purchases.take(purchases.size / 2))
      q.processAllAvailable()
      memC.addData(clicks.drop(clicks.size / 2)); memP.addData(purchases.drop(purchases.size / 2))
      q.processAllAvailable()
      val streamed = spark.table("t_ssjoin").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val batch = StreamOps.bandJoin(
          spark.createDataset(clicks).toDF().selectExpr("event_id", "user_id", "ts"),
          spark.createDataset(purchases).toDF().selectExpr("event_id", "user_id", "ts"),
          key = "user_id", bandSeconds = 300)
        .select("l_event_id", "r_event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(streamed == batch)
      assert(batch.nonEmpty, "fixture produced no in-band pairs — test is vacuous")
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER band join: unmatched lefts null-pad after the watermark") {
    val rows = eventRows
    val clicks = rows.filter(_.event_type == "click")
    val purchases = rows.filter(_.event_type == "purchase")
    val memC = MemoryStream[Ev]
    val memP = MemoryStream[Ev]
    def prep(df: org.apache.spark.sql.DataFrame) =
      StreamOps.withEventTime(df.selectExpr("event_id", "user_id", "ts"), "10 minutes")
    val q = StreamOps.bandJoin(prep(memC.toDF()), prep(memP.toDF()),
        key = "user_id", bandSeconds = 300, joinType = "left_outer")
      .select("l_event_id", "r_event_id")
      .writeStream.format("memory").queryName("t_ssouter").outputMode("append").start()
    try {
      memC.addData(clicks); memP.addData(purchases)
      q.processAllAvailable()
      // Push the watermark far past every click so unmatched lefts can
      // finalize: a late sentinel event on each side.
      val last = rows.map(_.ts).max(Ordering.by((t: LocalDateTime) => t.toString))
      val sentinel = Ev(999999L, -1L, "click", 0.0, last.plusHours(1))
      memC.addData(Seq(sentinel)); memP.addData(Seq(sentinel.copy(event_id = 999998L)))
      q.processAllAvailable()
      val streamed = spark.table("t_ssouter")
        .where(org.apache.spark.sql.functions.col("l_event_id") =!= 999999L)
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .sorted.toSeq
      val batch = StreamOps.bandJoin(
          spark.createDataset(clicks).toDF().selectExpr("event_id", "user_id", "ts"),
          spark.createDataset(purchases).toDF().selectExpr("event_id", "user_id", "ts"),
          key = "user_id", bandSeconds = 300, joinType = "left_outer")
        .select("l_event_id", "r_event_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .sorted.toSeq
      assert(streamed == batch)
      // The outer semantics is non-vacuous both ways: some clicks matched,
      // some went unmatched and were null-padded.
      assert(batch.exists(_._2 == -1L) && batch.exists(_._2 != -1L))
    } finally q.stop()
  }

  test("stream dedup removes cross-batch duplicate keys") {
    val rows = eventRows.take(50)
    val mem = MemoryStream[Ev]
    val q = StreamOps.dedup(StreamOps.withEventTime(mem.toDF(), "1 day"), Seq("event_id"))
      .writeStream.format("memory").queryName("t_dedup").outputMode("append").start()
    try {
      mem.addData(rows)
      q.processAllAvailable()
      mem.addData(rows.take(10)) // replayed duplicates
      q.processAllAvailable()
      assert(spark.table("t_dedup").count() == rows.size)
    } finally q.stop()
  }

  test("dedupWithinWatermark bounds state: duplicates drop inside the delay, keys age out past it") {
    val t0 = LocalDateTime.of(2026, 1, 1, 0, 0, 0)
    def ev(id: Long, ts: LocalDateTime) = Ev(id, 1L, "click", 1.0, ts)
    val mem = MemoryStream[Ev]
    val q = StreamOps.dedupWithinWatermark(
        StreamOps.withEventTime(mem.toDF(), "10 minutes"), Seq("event_id"))
      .writeStream.format("memory").queryName("t_dedup_wm").outputMode("append").start()
    try {
      mem.addData(Seq(ev(1, t0)))
      q.processAllAvailable()
      // Replay within the delay: dropped as a duplicate.
      mem.addData(Seq(ev(1, t0.plusMinutes(1))))
      q.processAllAvailable()
      assert(spark.table("t_dedup_wm").count() == 1)
      // Advance the watermark far past key 1's state, then replay it:
      // the key's state has aged out, so it is emitted again.
      mem.addData(Seq(ev(2, t0.plusHours(2))))
      q.processAllAvailable()
      mem.addData(Seq(ev(1, t0.plusHours(3))))
      q.processAllAvailable()
      assert(spark.table("t_dedup_wm").count() == 3,
        "aged-out key must re-emit — state was not bounded")
    } finally q.stop()
  }
}
