package graft

import org.apache.spark.sql.functions._

import graft.sources.{ColumnBounds, FileStats, LakeFs, Maintenance}

/** Diagnosis probe (not driver contract): the MANY-FILES lake regime.
  * LakeProbe's regime map tops out at 1024 files; the design claim is
  * "a scan over ~1M tiny files is scheduler-bound and manifest pruning
  * drops them at planning time" — this probe extends the measurement a
  * decade-plus: synthesize an n-file layout (n files × rowsPerFile rows,
  * disjoint sorted key ranges — the honest shape range pruning exists
  * for), then time, at that count:
  *
  *  - the raw Hadoop listing (every probe's staleness floor),
  *  - one-time manifest collection (the distributed census),
  *  - the steady-state pruned range probe (persisted manifest, memoized
  *    fingerprint) vs the full scan of the same predicate,
  *  - compaction planning (`Maintenance.plannedFiles`).
  *
  * Usage: runMain graft.LakeScaleProbe [nFiles] [rowsPerFile] [stateonly]
  * `stateonly` skips the listing/manifest/scan stages (already measured
  * at every tier in round 10) and runs just the layout write + the
  * round-12 steady-state stage — the 1M tier's scan stages cost ~25 min
  * of re-measurement the steady-state numbers don't need.
  */
object LakeScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 16384
    val rpf = if (args.length > 1) args(1).toInt else 16
    val stateOnly = args.length > 2 && args(2) == "stateonly"
    val spark = graft.engine.Graft.session("graft-lakescaleprobe")

    def med(samples: Int)(f: () => Unit): Double = {
      f()
      val xs = Seq.fill(samples) {
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      xs.sorted.apply(xs.size / 2)
    }
    def p(name: String, sec: Double, note: String = ""): Unit =
      println(f"== $name%-26s $sec%8.3f sec  $note")

    val dir = java.nio.file.Files.createTempDirectory("graft-lakescale")
      .toString + s"/lake_$n"
    val t0 = System.nanoTime()
    // One task per file (repartitionByRange(n)) pays ~250 ms of task +
    // committer overhead PER FILE — prohibitive past ~100k files. 32
    // range-partitioned tasks each writing a run of `rpf`-row files via
    // maxRecordsPerFile produce the same disjoint-sorted-range layout at
    // ~8 ms/file.
    spark.range(0, n.toLong * rpf)
      .select(col("id").as("k"), (col("id") % 97).cast("double").as("v"))
      .repartitionByRange(32, col("k")).sortWithinPartitions("k")
      .write.option("maxRecordsPerFile", rpf).parquet(dir)
    p("write_layout", (System.nanoTime() - t0) / 1e9, s"files=$n rows=${n.toLong * rpf}")

    if (!stateOnly) {
    p("hadoop_listing", med(3)(() => LakeFs.listFiles(dir, skipHiddenDirs = true)))

    val tc0 = System.nanoTime()
    val manifest = FileStats.collect(spark, dir, Seq("k")).persist()
    val mRows = manifest.count()
    p("manifest_collect", (System.nanoTime() - tc0) / 1e9, s"manifest_rows=$mRows")

    // Selective range probe: ~1/64 of the keyspace.
    val hi = n.toLong * rpf
    val bounds = Seq(ColumnBounds("k", Some(hi / 4), Some(hi / 4 + hi / 64)))
    val survivors = FileStats.prunedFiles(manifest, bounds).size
    p("range_probe_pruned", med(3)(() =>
      FileStats.prunedRead(spark, dir, manifest, bounds)
        .agg(count(lit(1)).as("n"), round(sum(col("v")), 2).as("s")).collect()),
      s"files=$survivors/$n")
    p("range_probe_trusted", med(3)(() =>
      FileStats.prunedRead(spark, dir, manifest, bounds, trustManifest = true)
        .agg(count(lit(1)).as("n"), round(sum(col("v")), 2).as("s")).collect()))
    // Past ~200k files one full-scan sample is minutes of pure task
    // scheduling — time it ONCE, cold (the cold number IS the regime
    // being measured; warm footer caches would flatter it).
    val fullScan = () =>
      spark.read.parquet(dir).where(FileStats.residual(bounds))
        .agg(count(lit(1)).as("n"), round(sum(col("v")), 2).as("s")).collect()
    if (n > 200000) {
      val tf = System.nanoTime(); fullScan()
      p("range_probe_full", (System.nanoTime() - tf) / 1e9, "single cold sample")
    } else p("range_probe_full", med(3)(() => { fullScan(); () }))

    p("compact_planning", med(3)(() => { Maintenance.plannedFiles(dir); () }),
      s"planned=${Maintenance.plannedFiles(dir)}")
    }

    // ---- Steady-state production shape (round 12): the raw many-file
    // landing zone is compacted ONCE into a bucketed+sorted state table
    // (trustManifest sheds the listing on probes; Bucketed sheds the
    // Exchange on state joins). Measured: the one-time bucketed rewrite,
    // then a keyed state join against a second keyed table — raw layout
    // vs bucketed state, broadcast disabled so the join shape (shuffle
    // both sides vs zero Exchange) is what's timed.
    val buckets = 32
    val tbl = s"lakescale_state_$n"
    val tb0 = System.nanoTime()
    graft.sources.Bucketed.write(
      spark.read.parquet(dir), tbl, s"$dir-bucketed", "k", buckets)
    p("bucketed_rewrite", (System.nanoTime() - tb0) / 1e9,
      s"$n files -> $buckets buckets")
    val rhsDir = s"$dir-rhs"
    spark.range(0, n.toLong * rpf, 64)
      .select(col("id").as("k"), (col("id") % 7).cast("double").as("w"))
      .write.parquet(rhsDir)
    val rhs = spark.read.parquet(rhsDir)
    def timedJoin(left: org.apache.spark.sql.DataFrame): () => Unit = () => {
      val joined = left.join(rhs, "k")
        .agg(count(lit(1)).as("n"), round(sum(col("v") * col("w")), 2).as("s"))
      joined.collect(); ()
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val rawJoin = timedJoin(spark.read.parquet(dir))
      if (n > 200000) {
        val tj = System.nanoTime(); rawJoin()
        p("state_join_raw", (System.nanoTime() - tj) / 1e9, "single cold sample")
      } else p("state_join_raw", med(3)(rawJoin))
      p("state_join_bucketed", med(3)(timedJoin(spark.table(tbl))))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    spark.stop()
  }
}
