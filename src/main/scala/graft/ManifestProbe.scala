package graft

import org.apache.spark.sql.functions._

import graft.sources.{ColumnBounds, FileStats}

/** Diagnosis probe (not driver contract): per-step cost breakdown of one
  * [[FileStats.prunedRead]] probe at the bench shape (sorted orders
  * layout, 32 files, selective range) — where does the steady-state
  * x_manifest_prune second actually go? Steps timed separately:
  * disk listing + driver md5 fold, the manifest-side staleness/survivor
  * aggregation, explicit-file read planning, and the survivor scan. */
object ManifestProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Graft.session("graft-manifestprobe")
    graft.sources.Catalog.register(spark,
      if (args.nonEmpty) args(0) else "/root/testdata/sf0.1")

    def med(f: () => Unit): Double = {
      f(); f()
      val xs = Seq.fill(15) {
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      xs.sorted.apply(xs.size / 2)
    }
    def p(name: String, sec: Double): Unit = println(f"== $name%-26s $sec%8.4f sec")

    val dir = java.nio.file.Files.createTempDirectory("graft-manifestprobe")
      .toString + "/orders"
    spark.table("orders")
      .repartitionByRange(32, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
      .write.parquet(dir)
    val manifest = FileStats.collect(spark, dir, Seq("o_orderkey")).persist()
    manifest.count()
    val mx = spark.table("orders").agg(max(col("o_orderkey"))).head().getLong(0)
    val bounds = Seq(ColumnBounds("o_orderkey", Some(mx / 4), Some(mx / 4 + mx / 64)))

    // Full probe (the bench thunk).
    p("full_probe", med(() =>
      FileStats.prunedRead(spark, dir, manifest, bounds)
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("s"))
        .collect()))

    // Step 1: Hadoop listing + driver-side md5 fold (and the listing alone).
    p("disk_listing_md5", med(() => FileStats.probeDiskFingerprint(dir)))
    p("hadoop_listing_only", med(() =>
      graft.sources.LakeFs.listFiles(dir, skipHiddenDirs = true)))
    // Alternatives: listStatus-based manual walk vs listFiles iterator.
    p("hadoop_listStatus_walk", med { () =>
      val (fs, root) = graft.sources.LakeFs.resolve(dir)
      def walk(p: org.apache.hadoop.fs.Path): Seq[(String, Long)] =
        fs.listStatus(p).toSeq.flatMap { st =>
          if (st.isDirectory) {
            val n = st.getPath.getName
            if (n.startsWith("_") || n.startsWith(".")) Nil else walk(st.getPath)
          } else Seq((st.getPath.toString, st.getLen))
        }
      walk(root)
    })

    // Survivor filter alone (the persisted-manifest per-probe job), and
    // the same over a 1-partition view of the cache (fewer tasks).
    def survCond = col("n_rows") > 0L &&
      coalesce(col("max_o_orderkey") >= mx / 4, lit(true)) &&
      coalesce(col("min_o_orderkey") <= mx / 4 + mx / 64, lit(true))
    p("survivor_filter", med(() =>
      manifest.where(survCond).select("file").collect()))
    p("survivor_filter_coalesced", med(() =>
      manifest.coalesce(1).where(survCond).select("file").collect()))

    // Step 2: the manifest-side aggregation (staleness + survivors).
    p("manifest_agg", med(() => FileStats.probeManifestAgg(manifest, bounds)))

    // Step 3+4: plan an explicit-file read over the survivors and run the
    // survivor scan (separate from the staleness machinery).
    val files = FileStats.prunedFiles(manifest, bounds)
    println(s"   survivors = ${files.size}/32")
    p("plan_and_scan", med(() =>
      spark.read.option("basePath", dir).parquet(files: _*)
        .where(FileStats.residual(bounds))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("s"))
        .collect()))
    // Scan with a REUSED DataFrame (planning hoisted out).
    val reused = spark.read.option("basePath", dir).parquet(files: _*)
      .where(FileStats.residual(bounds))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("s"))
    p("scan_only_reused_plan", med(() => { reused.collect(); () }))

    // Re-time the full probe AFTER everything is warm — the first
    // measurement pays one-time codegen/classload; this one is the
    // steady state the bench's warm protocol sees.
    p("full_probe_warm", med(() =>
      FileStats.prunedRead(spark, dir, manifest, bounds)
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("s"))
        .collect()))

    spark.stop()
  }
}
