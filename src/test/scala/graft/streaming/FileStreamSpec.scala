package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The production entry shape: readStream over a file directory (not a
  * MemoryStream), processed with AvailableNow and compared to batch. */
class FileStreamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("parquet file stream through tumblingAgg converges to the batch result") {
    val dir = Files.createTempDirectory("graft-stream").toString + "/events"
    val batchEvents = TestSpark.table("events")
      .select("event_id", "user_id", "event_type", "value", "ts")
    // Several files so the source sees multiple splits.
    batchEvents.repartition(4).write.parquet(dir)

    val stream = spark.readStream
      .schema(batchEvents.schema)
      .parquet(dir)
    val q = StreamOps.tumblingAgg(stream)
      .writeStream.format("memory").queryName("t_filestream")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      val streamed = spark.table("t_filestream").collect()
        .map(graft.verify.Canon.canonRow).sorted.toSeq
      val batch = StreamOps.tumblingAgg(batchEvents).collect()
        .map(graft.verify.Canon.canonRow).sorted.toSeq
      assert(streamed == batch)
    } finally q.stop()
  }
}
