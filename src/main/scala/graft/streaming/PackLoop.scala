package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming twin of [[graft.api.Pipelines.packSequences]] (VERDICT r8
  * missing #1): pack a STREAMED corpus into fixed-token-budget training
  * sequences without a batch re-run. The carried state is one row per
  * stream — `(stream, base)`, the cumulative token count emitted so far —
  * so a document's pack offset continues exactly where the previous
  * micro-batch left off: the concatenation of per-batch outputs equals
  * the batch packer over the union of all batches (PackLoopSpec pins
  * equality across a restart/replay).
  *
  * Contract: within a stream, documents must arrive in nondecreasing
  * `orderCol` order ACROSS batches (the append-only event-time posture
  * every loop in this package assumes — [[DedupLoop]]'s monotone-id
  * first-seen contract is the same shape). Within a batch any order is
  * fine (the per-batch window sorts).
  *
  * Scale shape: per batch, one window partitioned by stream (batch-sized,
  * not corpus-sized — the global window the batch form avoids stays
  * avoided here), one null-safe join against stream-scale state
  * (rows = distinct streams, typically tiny), one state fold. Same
  * [[VersionedState]] machinery and exactly-once posture as the other
  * loops: deterministic Overwrite per batch id for both output
  * (`outDir/batch=<N>`) and state (`v<N+1>`), GC below the version read.
  */
object PackLoop {

  private val stateSchema = StructType(Seq(
    StructField("stream", StringType, nullable = true),
    StructField("base", LongType, nullable = true)))

  private def emptyState(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], stateSchema)

  /** Seed with batch-era totals: one row per stream, `base` = tokens
    * already packed (e.g. `packed.groupBy(stream).agg(sum(n_tok))` over
    * the batch output). Written as `v0` so batch 0 continues from it. */
  def seedState(prior: DataFrame, stateDir: String): Unit =
    VersionedState.seed(prior.select(col("stream").cast("string").as("stream"),
      col("base").cast("bigint").as("base")), stateDir)

  /** Current per-stream running token totals (empty if never run). */
  def latestState(spark: SparkSession, stateDir: String): DataFrame =
    VersionedState.latest(spark, stateDir, Some(stateSchema))
      .getOrElse(emptyState(spark))

  /** One micro-batch — exposed for direct replay tests; [[run]] wires it
    * into foreachBatch. */
  private[streaming] def packBatch(batch: DataFrame, batchId: Long,
                                   streamCol: String, orderCol: String,
                                   nTok: Column, budget: Int,
                                   stateDir: String, outDir: String): Unit = {
    val spark = batch.sparkSession
    val priorV = VersionedState.priorVersion(stateDir, batchId)
    val prior = priorV
      .map(v => VersionedState.read(spark, stateDir, v, Some(stateSchema)))
      .getOrElse(emptyState(spark))

    // Same arithmetic as the batch packer, with the carried base added to
    // the per-batch cumsum: __start = base + Σ earlier-in-batch n_tok.
    val w = Window.partitionBy(col("__stream")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val b = batch
      .withColumn("n_tok", nTok.cast("bigint"))
      .withColumn("__stream", col(streamCol).cast("string"))
    val packed = b
      .join(prior.select(col("stream").as("__ps"), col("base").as("__base")),
        col("__stream") <=> col("__ps"), "left")
      .withColumn("__start",
        coalesce(col("__base"), lit(0L)) +
          coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("pack_id", floor(col("__start") / budget.toDouble).cast("bigint"))
      .withColumn("pack_off", (col("__start") % budget).cast("bigint"))
      .withColumn("crosses", col("pack_off") + col("n_tok") > budget)
      .drop("__ps", "__base", "__start", "__stream")
    packed.write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$batchId")

    val batchTotals = b.groupBy(col("__stream").as("__bs"))
      .agg(sum(col("n_tok")).as("__add"))
    val folded = prior
      .join(batchTotals, col("stream") <=> col("__bs"), "full")
      .select(coalesce(col("stream"), col("__bs")).as("stream"),
        (coalesce(col("base"), lit(0L)) + coalesce(col("__add"), lit(0L))).as("base"))
    VersionedState.write(folded, stateDir, batchId + 1)
    priorV.foreach(VersionedState.gcBelow(stateDir, _))
  }

  /** Start the packing loop over `stream` (must carry `streamCol`,
    * `orderCol`, and whatever `nTok` reads). Packed rows land under
    * `outDir/batch=<id>/`; per-stream totals evolve under `stateDir`. */
  def run(stream: DataFrame, streamCol: String, orderCol: String,
          nTok: Column, budget: Int,
          stateDir: String, outDir: String, checkpointDir: String,
          trigger: Option[Trigger] = None): StreamingQuery = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        packBatch(batch, batchId, streamCol, orderCol, nTok, budget, stateDir, outDir)
      }
    trigger.foreach(w.trigger)
    w.start()
  }
}
