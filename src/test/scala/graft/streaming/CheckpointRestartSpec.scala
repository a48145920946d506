package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Exactly-once across restarts: a checkpointed file-source → file-sink
  * query, stopped and restarted after new data arrives, must process every
  * input row exactly once — the recovery contract a 100 TB ingest job
  * depends on. */
class CheckpointRestartSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("file-to-file streaming query resumes from checkpoint without duplicates") {
    val root = Files.createTempDirectory("graft-ckpt").toString
    val src = s"$root/src"
    val sink = s"$root/sink"
    val ckpt = s"$root/checkpoint"

    val events = TestSpark.table("events")
      .select("event_id", "user_id", "event_type", "value", "ts")
    val half1 = events.where("event_id % 2 = 0")
    val half2 = events.where("event_id % 2 = 1")

    def runOnce(): Unit = {
      val q = spark.readStream.schema(events.schema).parquet(src)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      q.stop()
    }

    half1.write.mode("append").parquet(src)
    runOnce()
    val afterFirst = spark.read.parquet(sink).count()
    assert(afterFirst == half1.count())

    half2.write.mode("append").parquet(src)
    runOnce()
    val all = spark.read.parquet(sink)
    assert(all.count() == events.count(), "restart must not duplicate or drop rows")
    assert(all.select("event_id").distinct().count() == events.count())
  }
}
