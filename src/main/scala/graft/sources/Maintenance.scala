package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Data-lake maintenance: the small-files problem is the dominant
  * operational failure mode of a 100 TB parquet lake (every file is a
  * task, a footer read, and a namenode entry — a million 1 MB files makes
  * a scan scheduler-bound, not IO-bound). [[compact]] rewrites a parquet
  * directory into ~`targetBytes` files.
  */
object Maintenance {

  /** Bytes of all data files under `dir` (recursive — partition dirs
    * included), listed through the Hadoop `FileSystem` API
    * ([[LakeFs.listFiles]]) so local paths, `file:` URIs, and
    * `hdfs://`/`s3a://` locations all size correctly. Files under
    * underscore/dot-prefixed directories are skipped — Spark's reader
    * would not scan them, so they must not inflate the sizing either. */
  private def dirBytes(dir: String): Long = {
    // Fail fast ONLY on a path that does not exist (the typo'd-compact
    // hazard). An existing-but-empty directory is a legitimate state — a
    // table fully emptied by a dedup/filter rewrite — and sizes to 0, so
    // compact/plannedFiles over it stay a 1-file no-op instead of a hard
    // failure indistinguishable from a typo.
    val (fs, path) = LakeFs.resolve(dir)
    require(fs.exists(path), s"directory does not exist: `$dir`")
    LakeFs.listFiles(dir, skipHiddenDirs = true).map(_._2).sum
  }

  /** Number of output files [[compact]] would write for `dir`. */
  def plannedFiles(dir: String, targetBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    math.max(1, math.ceil(dirBytes(dir).toDouble / targetBytes).toInt)
  }

  /** Compact a parquet directory into ~`targetBytes` files at `outDir`.
    *
    * Sizing reads the CURRENT on-disk bytes (compressed), so the output
    * count is computed from real data, not row-count guesses. The rewrite
    * is a single `repartition(n)` — a round-robin shuffle that also fixes
    * SKEWED file sizes, which `coalesce` (narrow, no shuffle) cannot; pass
    * `shuffle = false` to trade balance for a shuffle-free plan when the
    * inputs are already even. Writes to a NEW directory (never in place:
    * a failed in-place rewrite loses the table; swap directories at the
    * catalog/metastore level after validating the output). The guard
    * compares NORMALIZED REAL paths, so `x/../t` or symlinked aliases of
    * `dir` cannot slip past it. */
  def compact(spark: SparkSession, dir: String, outDir: String,
              targetBytes: Long = 128L * 1024 * 1024,
              shuffle: Boolean = true): DataFrame = {
    require(LakeFs.canonical(outDir) != LakeFs.canonical(dir),
      "compact never rewrites in place — write to a new directory and swap")
    val n = plannedFiles(dir, targetBytes)
    val df = spark.read.parquet(dir)
    val sized = if (shuffle) df.repartition(n) else df.coalesce(n)
    sized.write.mode(SaveMode.ErrorIfExists).parquet(outDir)
    spark.read.parquet(outDir)
  }

  /** The z-value: interleave the bits of per-column QUANTILE-RANK buckets
    * (bucket = #breakpoints ≤ value, breakpoints from approxQuantile so
    * every bucket holds ~equal rows regardless of the value
    * distribution). Pure column math — comparisons against a broadcast
    * literal array plus shifts — no window, no UDF. */
  private def zValue(df: DataFrame, cols: Seq[String], bitsPerCol: Int): Column = {
    val buckets = 1 << bitsPerCol
    val breaks: Seq[Array[Double]] = cols.map { c =>
      df.stat.approxQuantile(c,
        (1 until buckets).map(_.toDouble / buckets).toArray, 0.001)
    }
    val bucketCols = cols.zip(breaks).map { case (c, bs) =>
      // #breakpoints ≤ value == the value's quantile bucket in [0, 2^bits).
      bs.foldLeft(lit(0L)) { (acc, b) =>
        acc + when(col(c).cast("double") >= b, 1L).otherwise(0L)
      }
    }
    (0 until bitsPerCol).flatMap { k =>
      bucketCols.zipWithIndex.map { case (b, j) =>
        shiftleft(shiftright(b, k).bitwiseAND(1L), k * cols.size + j)
      }
    }.reduce(_ + _)
  }

  /** One-call PRUNING-READY write: range-partition + sort rows on
    * `sortCols` so each file owns a tight, nearly-disjoint min/max range,
    * write `files` parquet files, and persist the [[FileStats]] manifest
    * beside the data (`<outDir>_stats`) — the layout + stats pair a
    * selective range probe needs to schedule a handful of files instead
    * of all of them ([[FileStats.prunedRead]] is the read side; append +
    * [[FileStats.update]] keeps the manifest current at O(new data)).
    * Stats default to `sortCols` — the columns whose ranges the layout
    * actually tightened. Same never-in-place rule as [[compact]].
    * Returns (data, manifest) as re-read from disk. */
  def writeOptimized(spark: SparkSession, df: DataFrame, outDir: String,
                     sortCols: Seq[String], files: Int,
                     statsCols: Seq[String] = Nil): (DataFrame, DataFrame) = {
    require(sortCols.nonEmpty && files > 0, "need at least one sort column and one file")
    // Normalize away trailing slashes: "x/y/" + "_stats" would otherwise
    // nest the manifest INSIDE the data directory.
    val out = outDir.reverse.dropWhile(_ == '/').reverse
    require(out.nonEmpty, s"not a writable directory path: $outDir")
    val stats = if (statsCols.nonEmpty) statsCols else sortCols
    df.repartitionByRange(files, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.ErrorIfExists).parquet(out)
    FileStats.writeManifest(
      FileStats.collect(spark, out, stats), s"${out}_stats")
    (spark.read.parquet(out), FileStats.readManifest(spark, s"${out}_stats"))
  }

  /** Targeted MERGE (CDC upsert + delete) into a parquet state
    * directory — copy-on-write at FILE granularity, the operation that
    * makes a keyed 100 TB state table maintainable without a full
    * rewrite per change batch.
    *
    * Semantics (replace-by-key): after the call, every row of `dir`
    * whose `key` appears in `changes` or `deleteKeys` is gone, and all
    * rows of `changes` are present — i.e. the table equals
    * `old ∖ keys(changes ∪ deleteKeys) ∪ changes`. Multiple change rows
    * per key are allowed (all inserted); `changes` rows with a NULL key
    * are rejected (null never equi-matches, so they could only
    * accumulate). `deleteKeys` is a single-column frame of keys to
    * drop without replacement.
    *
    * Scale shape — the Delta-merge file-finding discipline, built on
    * the stats manifest:
    *  1. ENVELOPE prune: `[min, max]` of the change keys (one tiny agg)
    *     feeds [[FileStats.prunedFiles]], dropping files at planning
    *     time on a sorted/z-ordered layout before any task exists.
    *  2. TOUCH scan: the surviving candidates' KEY COLUMN ONLY is
    *     scanned and left-semi joined against the change keys under
    *     `input_file_name()` — exact touched-file set, one narrow
    *     columnar pass over candidates (finding rows by key below the
    *     key column's bytes is information a manifest cannot carry).
    *  3. REWRITE touched files only: surviving rows (anti join on key)
    *     + all change rows, staged into a hidden `_upsert_*` subdir
    *     (invisible to concurrent parquet scans), then moved in and
    *     the touched files deleted.
    *  4. MANIFEST maintenance: [[FileStats.rewrite]] drops the touched
    *     rows and stats only the staged files — O(change batch), never
    *     a re-collect; the refreshed manifest is returned (persist it
    *     with [[FileStats.writeManifest]]).
    *
    * Crash posture (plain parquet has no commit log — detection, not
    * atomicity): staged files move in BEFORE touched files are deleted,
    * so no committed row is ever lost; a crash inside the swap window
    * leaves duplicate key versions that (a) any manifest-checked read
    * refuses loudly (staleness fingerprint), and (b) re-running the
    * SAME upsert repairs — the re-run's anti join removes every copy of
    * every change key before re-inserting exactly one. Single writer
    * assumed, like [[compact]]/[[zorder]]. Readers racing the swap can
    * see a mix — swap under a catalog pointer for snapshot isolation.
    *
    * TIME TRAVEL: with `retainHistory` the touched files move to the
    * hidden `_history/` subdir instead of being deleted (invisible to
    * raw parquet scans — Spark skips underscore paths — and to every
    * manifest freshness/listing check, which hide hidden dirs), so any
    * PERSISTED pre-merge manifest stays readable via [[readAt]]: the
    * manifest version IS the snapshot, the Delta/Iceberg reading
    * discipline without a commit log. Bound the retained bytes with
    * [[vacuumHistory]].
    *
    * SCHEMA EVOLUTION: with `evolveSchema` a change batch may carry NEW
    * columns (or omit old non-key ones) — rewritten files union by name
    * with null padding, and the returned table reads with
    * `mergeSchema` so the widened schema is visible immediately. The
    * honest plain-parquet caveat: only TOUCHED files are rewritten, so
    * UNTOUCHED files keep the old physical schema forever and every
    * later reader of the raw dir must also pass `mergeSchema` (or read
    * via the returned frame / compact the table) — there is no commit
    * log to carry the widened schema for them. [[upsert]] is itself
    * such a later reader: the rewrite always reads touched files with
    * `mergeSchema`, so a merge whose touched set spans generations of a
    * previously-evolved table rewrites every column (a plain read would
    * infer one generation's schema and silently drop the other's
    * columns before deleting the originals). Off by default: without
    * the flag a schema-divergent batch fails loudly before the rewrite,
    * which is the right default for a typed state table.
    *
    * Returns `(table, refreshed manifest)`. */
  def upsert(spark: SparkSession, dir: String, manifest: DataFrame,
             changes: DataFrame, key: String,
             deleteKeys: Option[DataFrame] = None,
             targetBytes: Long = 128L * 1024 * 1024,
             retainHistory: Boolean = false,
             evolveSchema: Boolean = false): (DataFrame, DataFrame) = {
    require(changes.columns.contains(key), s"changes lack key column `$key`")
    val statsCols = FileStats.statsColumns(manifest)
    require(statsCols.contains(key),
      s"manifest carries no stats for `$key` (has: ${statsCols.mkString(", ")}) — " +
        "collect the manifest over the merge key")
    require(changes.where(col(key).isNull).isEmpty,
      "null-keyed change rows are not mergeable (null never equi-matches)")
    val delKeys = deleteKeys.map { d =>
      require(d.columns.length == 1, "deleteKeys must be a single key column")
      d.select(col(d.columns.head).cast(changes.schema(key).dataType).as(key))
    }
    val changeKeys = delKeys.foldLeft(changes.select(col(key)))(_ unionByName _)
      .where(col(key).isNotNull).distinct().localCheckpoint()
    // Pin the manifest BEFORE mutating the directory: an un-persisted
    // manifest re-lists lazily, and a post-swap re-evaluation would
    // double-count the files this call is about to move in.
    val m0 = manifest.localCheckpoint()
    // 1. Envelope prune (two scalars — bounded driver data).
    val env = changeKeys.agg(min(col(key)), max(col(key))).head()
    // Empty/no-op returns read exactly as the normal return path does:
    // after any past evolution the dir is a MIXED physical layout, and a
    // plain read would sample one footer's schema — silently hiding (or
    // showing) the widened columns depending on which file wins.
    def tableView() =
      if (evolveSchema) spark.read.option("mergeSchema", "true").parquet(dir)
      else spark.read.parquet(dir)
    if (env.isNullAt(0)) return (tableView(), m0) // empty batch
    val candidates = FileStats.prunedFiles(m0,
      Seq(ColumnBounds(key, Some(env.get(0)), Some(env.get(1)))))
    // 2. Exact touched set: key column + file name over candidates only.
    val touched =
      if (candidates.isEmpty) Seq.empty[String]
      else spark.read.parquet(candidates: _*)
        .select(col(key), input_file_name().as("__f"))
        .join(changeKeys, Seq(key), "left_semi")
        .select("__f").distinct().collect().map(_.getString(0)).toSeq
    // Delete-only batch touching nothing: there is no row to remove and
    // none to add — staging would move one zero-row part file into the
    // table root per call, growing the file count without bound.
    if (touched.isEmpty && changes.isEmpty) return (tableView(), m0)
    // 3. Copy-on-write rewrite of the touched files.
    val (fs, root) = LakeFs.resolve(dir)
    val staging = new org.apache.hadoop.fs.Path(root,
      s"_upsert_${java.util.UUID.randomUUID().toString.take(8)}")
    val survivors =
      if (touched.isEmpty) changes
      else {
        // ALWAYS merge the touched files' schemas: after any past
        // evolveSchema merge the table is a mixed physical layout, and a
        // plain read infers the schema from ONE file — survivors from
        // the other generation would silently lose their extra columns
        // and this call then deletes the originals (permanent loss).
        val old = spark.read.option("mergeSchema", "true").parquet(touched: _*)
        if (!evolveSchema)
          require(old.columns.sorted.sameElements(changes.columns.sorted),
            s"touched files carry schema (${old.columns.sorted.mkString(", ")}) " +
              s"but changes carry (${changes.columns.sorted.mkString(", ")}) — " +
              "pass evolveSchema = true to merge divergent schemas")
        old.join(changeKeys, Seq(key), "left_anti")
          .unionByName(changes, allowMissingColumns = evolveSchema)
      }
    val touchedBytes = touched.map(p =>
      fs.getFileStatus(new org.apache.hadoop.fs.Path(p)).getLen).sum
    val nOut = math.max(1, math.ceil(touchedBytes.toDouble / targetBytes).toInt)
    survivors.repartition(nOut).write.mode(SaveMode.ErrorIfExists)
      .parquet(staging.toString)
    val staged = LakeFs.listFiles(staging.toString, skipHiddenDirs = true)
      .map(_._1).filter(_.endsWith(".parquet"))
    val moved = staged.map { s =>
      val sp = new org.apache.hadoop.fs.Path(s)
      val dest = new org.apache.hadoop.fs.Path(root, sp.getName)
      require(fs.rename(sp, dest), s"failed to move staged file $s into $dir")
      dest.toString
    }
    if (retainHistory && touched.nonEmpty) {
      val hist = new org.apache.hadoop.fs.Path(root, HistoryDir)
      fs.mkdirs(hist)
      touched.foreach { t =>
        val tp = new org.apache.hadoop.fs.Path(t)
        require(fs.rename(tp, new org.apache.hadoop.fs.Path(hist, tp.getName)),
          s"failed to retire $t into $HistoryDir")
      }
    } else touched.foreach(t =>
      fs.delete(new org.apache.hadoop.fs.Path(t), false))
    fs.delete(staging, true)
    // 4. O(batch) manifest maintenance.
    val m2 = FileStats.rewrite(spark, m0, touched, moved, statsCols)
    val table =
      if (evolveSchema) spark.read.option("mergeSchema", "true").parquet(dir)
      else spark.read.parquet(dir)
    (table, m2)
  }

  /** Where [[upsert]]`(retainHistory = true)` retires replaced files:
    * hidden from raw parquet scans and every manifest listing. */
  val HistoryDir = "_history"

  /** SNAPSHOT READ — the table exactly as a persisted manifest version
    * describes it, regardless of merges applied since. Live paths read
    * in place; paths a later `retainHistory` upsert retired resolve
    * into `_history/` by basename (parquet part names carry a per-job
    * UUID, so basenames never collide across versions). A referenced
    * file that exists in neither place fails LOUDLY — that snapshot was
    * vacuumed, and silently reading a partial version would be data
    * loss dressed as success. `preds` prune at planning time from the
    * SNAPSHOT's own stats ([[FileStats.prunedFiles]]), so time-travel
    * reads keep the manifest pruning discipline; the freshness
    * fingerprint is deliberately NOT checked — being "stale" is the
    * entire point of a snapshot read. Driver cost: TWO directory LISTs
    * (live + `_history`) and in-memory set membership — deliberately
    * NOT one `fs.exists` per snapshot file, which would be one RPC per
    * file on object storage and re-create the per-file floor the
    * manifest exists to avoid (at 1M files, ~the full listing cost ×
    * a round trip each). */
  def readAt(spark: SparkSession, dir: String, manifest: DataFrame,
             preds: Seq[FilePredicate] = Nil): DataFrame = {
    val files =
      if (preds.isEmpty)
        manifest.select("file").collect().map(_.getString(0)).toSeq
      else FileStats.prunedFiles(manifest, preds)
    val (_, root) = LakeFs.resolve(dir)
    val live: Set[String] = LakeFs.listFiles(dir, skipHiddenDirs = true)
      .map(f => LakeFs.normPath(f._1)).toSet
    val histDir = new org.apache.hadoop.fs.Path(root, HistoryDir).toString
    val hist: Map[String, String] = LakeFs.listFiles(histDir, skipHiddenDirs = false)
      .map { case (p, _) => new org.apache.hadoop.fs.Path(p).getName -> p }.toMap
    val resolved = files.map { f =>
      if (live.contains(LakeFs.normPath(f))) f
      else hist.getOrElse(new org.apache.hadoop.fs.Path(f).getName,
        throw new IllegalArgumentException(
          s"snapshot file $f exists neither live nor in $HistoryDir — " +
            "this version was vacuumed; a partial read would be silent data loss"))
    }
    if (resolved.isEmpty) spark.read.parquet(dir).limit(0)
    else spark.read.parquet(resolved: _*)
  }

  /** Bound the [[upsert]]`(retainHistory = true)` storage: delete every
    * `_history/` file not referenced by any of the `retained` manifest
    * versions (pass the versions you still want [[readAt]]-able; pass
    * Nil to drop all history). Live files are never touched — only the
    * hidden dir is swept. Returns the deleted paths. */
  def vacuumHistory(spark: SparkSession, dir: String,
                    retained: Seq[DataFrame]): Seq[String] = {
    val (fs, root) = LakeFs.resolve(dir)
    val hist = new org.apache.hadoop.fs.Path(root, HistoryDir)
    if (!fs.exists(hist)) return Nil
    val keep: Set[String] = retained.flatMap(
      _.select("file").collect().map(r =>
        new org.apache.hadoop.fs.Path(r.getString(0)).getName)).toSet
    val victims = fs.listStatus(hist)
      .filter(st => !st.isDirectory && !keep.contains(st.getPath.getName))
      .map(_.getPath).toSeq
    victims.foreach(p => fs.delete(p, false))
    victims.map(_.toString)
  }

  /** Z-ORDER rewrite: range-partition and sort the table by an
    * interleaved-bits curve over `cols`, so rows close in EVERY listed
    * dimension land in the same files — parquet min/max stats then prune
    * multi-dimension range predicates, where a plain sort helps only its
    * leading column. The layout lever for 100 TB range scans: a box
    * predicate touches a handful of files instead of all of them
    * (MaintenanceSpec measures exactly that via input_file_name).
    * Same never-in-place rule as [[compact]]. */
  def zorder(spark: SparkSession, dir: String, outDir: String,
             cols: Seq[String], files: Int,
             bitsPerCol: Int = 8): DataFrame = {
    require(LakeFs.canonical(outDir) != LakeFs.canonical(dir),
      "zorder never rewrites in place — write to a new directory and swap")
    require(cols.nonEmpty && files > 0, "need at least one column and one file")
    require(cols.size * bitsPerCol <= 63,
      s"z-value must fit a signed Long: cols×bits = ${cols.size * bitsPerCol} > 63")
    val df = spark.read.parquet(dir)
    df.withColumn("__z", zValue(df, cols, bitsPerCol))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.ErrorIfExists).parquet(outDir)
    spark.read.parquet(outDir)
  }
}
