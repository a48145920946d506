package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.TemporalOps

/** The streaming as-of join must replay to the batch asofJoin's result on
  * the q15 fixture shape (purchases matched to the latest earlier click),
  * including lefts whose match arrives in a LATER micro-batch. */
class StreamAsofSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def key(m: AsofMatched) =
    (m.key, m.left_id, m.ts.getTime, m.right_ts.map(_.getTime), m.value)

  /** Batch ground truth via TemporalOps.asofJoin on the same rows. */
  private def batchAsof(lefts: Seq[AsofLeftEvent], rights: Seq[AsofRightEvent]) = {
    val l = lefts.toDF()
    val r = rights.toDF().select(col("key"), col("ts").as("rts"), col("value"))
    TemporalOps.asofJoin(l, r, "key", "ts", "rts", Seq("rts", "value"))
      .collect().map(row => (row.getLong(0), row.getLong(2),
        row.getTimestamp(1).getTime,
        Option(row.getTimestamp(3)).map(_.getTime),
        Option(row.get(4)).map(_.asInstanceOf[Double]))).toSet
  }

  private def replay(lefts: Seq[AsofLeftEvent], rights: Seq[AsofRightEvent],
                     batches: Seq[(Seq[AsofLeftEvent], Seq[AsofRightEvent])],
                     name: String): Set[(Long, Long, Long, Option[Long], Option[Double])] = {
    val ml = MemoryStream[AsofLeftEvent]
    val mr = MemoryStream[AsofRightEvent]
    val q = StreamAsof.asofJoin(ml.toDS(), mr.toDS(), "2 days")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { case (lb, rb) =>
        if (lb.nonEmpty) ml.addData(lb)
        if (rb.nonEmpty) mr.addData(rb)
        q.processAllAvailable()
      }
      // Watermark-advancing sentinel on an unused key flushes every left.
      val far = new Timestamp(
        (lefts.map(_.ts.getTime) ++ rights.map(_.ts.getTime)).max + 400L * 24 * 3600 * 1000)
      mr.addData(Seq(AsofRightEvent(-1L, far, 0.0)))
      q.processAllAvailable()
      spark.table(name).as[AsofMatched].collect().toSeq
        .filter(_.key >= 0).map(key).toSet
    } finally q.stop()
  }

  test("stream as-of replay equals the batch asofJoin on the q15 fixture shape") {
    val events = TestSpark.table("events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        col("ts").cast(org.apache.spark.sql.types.TimestampType).as("ts"))
    val lefts = events.where(col("event_type") === "purchase")
      .select(col("user_id").as("key"), col("ts"), col("event_id").as("left_id"))
      .as[AsofLeftEvent].collect().toSeq.sortBy(_.ts.getTime)
    val rights = events.where(col("event_type") === "click")
      .select(col("user_id").as("key"), col("ts"), col("value"))
      .as[AsofRightEvent].collect().toSeq.sortBy(_.ts.getTime)

    // Slice both sides by GLOBAL event time (per-side row slicing would
    // let the two timelines diverge past the watermark and legitimately
    // drop boundary lefts as late — not what this test is probing).
    val n = 4
    val allTs = (lefts.map(_.ts.getTime) ++ rights.map(_.ts.getTime)).sorted
    val bounds = (1 until n).map(i => allTs(i * allTs.size / n))
    def batchOf(t: Long): Int = bounds.count(_ <= t)
    val batches = (0 until n).map { i =>
      (lefts.filter(l => batchOf(l.ts.getTime) == i),
        rights.filter(r => batchOf(r.ts.getTime) == i))
    }
    val streamed = replay(lefts, rights, batches, "t_asof")
    assert(streamed == batchAsof(lefts, rights) && streamed.nonEmpty)
  }

  test("a left is held until the watermark passes it: late right in a later batch still matches") {
    def t(h: Int, m: Int) = new Timestamp(
      java.time.LocalDateTime.of(2024, 6, 1, h, m)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
    val lefts = Seq(AsofLeftEvent(5L, t(12, 0), 100L))
    // The matching right (11:50) arrives one batch AFTER the left but well
    // inside the watermark: an eager emit would have matched the 09:00
    // right (or nothing); the held left must match 11:50.
    val rights = Seq(AsofRightEvent(5L, t(9, 0), 1.0), AsofRightEvent(5L, t(11, 50), 2.0))
    val batches = Seq(
      (Seq.empty[AsofLeftEvent], Seq(rights.head)),
      (lefts, Seq.empty[AsofRightEvent]),
      (Seq.empty[AsofLeftEvent], Seq(rights(1))))
    val streamed = replay(lefts, rights, batches, "t_asof_late")
    assert(streamed == batchAsof(lefts, rights))
    assert(streamed.head._4.contains(t(11, 50).getTime) && streamed.head._5.contains(2.0))
  }
}
