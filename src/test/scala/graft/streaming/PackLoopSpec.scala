package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The streaming packer must produce EXACTLY the batch
  * [[graft.api.Pipelines.packSequences]] assignment — pack ids, offsets,
  * boundary-cross flags — across micro-batch boundaries, a mid-stream
  * restart, a crash replay, and a batch-era seed. */
class PackLoopSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // Streams = doc_id mod 4, order = doc_id, token count from the text —
  // the q163 shape with enough streams to exercise the per-stream state.
  private def docs = TestSpark.table("documents")
    .select(col("doc_id"), (col("doc_id") % 4).as("src"), col("text"))
  private def nTok = size(split(col("text"), " "))
  private val budget = 256

  private def canon(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  private def packedCols(df: DataFrame): DataFrame =
    df.select("doc_id", "src", "n_tok", "pack_id", "pack_off", "crosses")

  private def batchForm: DataFrame = packedCols(
    graft.api.Pipelines.packSequences(docs, "src", "doc_id", nTok, budget))

  // Fixture-size-independent split point: half the docs per stage.
  private lazy val mid: Long =
    docs.agg((max(col("doc_id")) / 2).cast("bigint")).head().getLong(0)

  test("two-stage run with restart ≡ batch packSequences, exactly") {
    val root = Files.createTempDirectory("graft-packloop").toString
    val (src, state, out, ckpt) =
      (s"$root/src", s"$root/state", s"$root/out", s"$root/ckpt")
    // Arrival respects per-stream orderCol order across batches (the
    // loop's documented append-only contract): stage 1 = low doc_ids.
    val stage1 = docs.where(col("doc_id") < mid)
    val stage2 = docs.where(col("doc_id") >= mid)

    def runOnce(): Unit = {
      val q = PackLoop.run(
        spark.readStream.schema(docs.schema).parquet(src),
        "src", "doc_id", nTok, budget, state, out, ckpt,
        trigger = Some(Trigger.AvailableNow()))
      q.awaitTermination(120000)
      q.stop()
    }

    stage1.write.mode("append").parquet(src)
    runOnce() // STOP — mid-stream restart
    stage2.write.mode("append").parquet(src)
    runOnce()

    val streamed = packedCols(spark.read.parquet(out))
    assert(canon(streamed) == canon(batchForm) && canon(streamed).nonEmpty)
    // Carried state = full-corpus per-stream token totals.
    val totals = docs.select(col("src").cast("string").as("stream"),
        nTok.cast("bigint").as("t"))
      .groupBy("stream").agg(sum("t").as("base"))
    assert(canon(PackLoop.latestState(spark, state)) == canon(totals))
  }

  test("replaying a batch (crash before checkpoint commit) is idempotent") {
    val root = Files.createTempDirectory("graft-packloop-rp").toString
    val (state, out) = (s"$root/state", s"$root/out")
    val b0 = docs.where(col("doc_id") < mid)
    PackLoop.packBatch(b0, 0L, "src", "doc_id", nTok, budget, state, out)
    val first = (canon(packedCols(spark.read.parquet(out))),
      canon(PackLoop.latestState(spark, state)))
    PackLoop.packBatch(b0, 0L, "src", "doc_id", nTok, budget, state, out)
    val second = (canon(packedCols(spark.read.parquet(out))),
      canon(PackLoop.latestState(spark, state)))
    assert(first == second && first._1.nonEmpty)
  }

  test("batch-era seed: the loop continues mid-pack, not from zero") {
    val root = Files.createTempDirectory("graft-packloop-seed").toString
    val (state, out) = (s"$root/state", s"$root/out")
    val hist = docs.where(col("doc_id") < mid)
    val live = docs.where(col("doc_id") >= mid)
    // Seed = per-stream totals of the batch-era packed history.
    PackLoop.seedState(
      hist.select(col("src").as("stream"), nTok.cast("bigint").as("t"))
        .groupBy("stream").agg(sum("t").as("base")), state)
    PackLoop.packBatch(live, 0L, "src", "doc_id", nTok, budget, state, out)
    // Live rows carry the offsets the full batch packer assigns them.
    val expected = batchForm.join(live.select("doc_id"), Seq("doc_id"))
    assert(canon(packedCols(spark.read.parquet(out))) == canon(expected)
      && canon(expected).nonEmpty)
  }
}
