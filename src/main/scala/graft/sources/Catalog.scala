package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, StructType}

import graft.engine.Graft

/** Table registration over a test-data directory (one parquet per table).
  *
  * The nanos-timestamp ingest rewrite (SURVEY.md H1) lives here so that no
  * other code path ever sees a raw nanosecond LongType `ts`:
  * `events.ts` TIMESTAMP(NANOS) → read as Long (legacy conf) → integer
  * `div 1000` → `timestamp_micros` → TIMESTAMP_NTZ. Integer division is
  * load-bearing: double division corrupts the microsecond digit above 2^53.
  */
object Catalog {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** H1 discipline, format- and name-independent: a column named exactly
    * `ts` that reads as a raw LONG is the driver's nanosecond epoch
    * (parquet TIMESTAMP(NANOS) under the legacy conf, or the same epoch
    * in a csv/json lake) and is rewritten to timestamp_ntz. A
    * timestamp-typed `ts` (plain micros/millis from any non-driver
    * source) passes through untouched — the trigger is the observed
    * type, never an assumption. */
  private def h1(df: DataFrame): DataFrame =
    if (df.schema.find(_.name == "ts").exists(_.dataType == LongType))
      df.withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
    else df

  /** Load one table from `dir` (parquet layout of the driver fixtures). */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    Graft.configure(spark)
    h1(spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** Attach ONE table of any supported format at `path` as the temp view
    * `name` — the non-parquet-lake entry point, with the same H1 nanos
    * discipline parquet gets. Supply `schema` for csv/json lakes (the
    * engine's numeric/decimal/date types are a contract; csv inference
    * picks int-vs-long by value range and is offered only as an
    * exploration convenience). Returns the registered frame. */
  def registerTable(spark: SparkSession, name: String, path: String,
                    format: String = "parquet",
                    schema: Option[StructType] = None): DataFrame = {
    Graft.configure(spark)
    val reader = spark.read
    schema.foreach(reader.schema)
    val raw = format match {
      case "parquet" => reader.parquet(path)
      case "csv" =>
        if (schema.isEmpty) reader.option("inferSchema", "true").option("header", "true").csv(path)
        else reader.option("header", "true").csv(path)
      case "json" => reader.json(path)
      case "orc" => reader.orc(path)
      case other => throw new IllegalArgumentException(
        s"unsupported catalog format: $other (parquet | csv | json | orc)")
    }
    val df = h1(raw)
    df.createOrReplaceTempView(name)
    df
  }

  /** Schema report: table → (column, type) list as the engine exposes it
    * (post-ingest-rewrite — events.ts reports as timestamp_ntz, not the
    * raw parquet nanos long). */
  def describe(spark: SparkSession, dir: String): Map[String, Seq[(String, String)]] =
    tableNames.map { n =>
      n -> load(spark, dir, n).schema.fields.toSeq
        .map(f => (f.name, f.dataType.simpleString))
    }.toMap

  /** Register `path` as an EXTERNAL catalog table named `name` and compute
    * table statistics (plus column statistics for `analyzeColumns` — give
    * it the join/filter keys), i.e. the `ANALYZE TABLE ... COMPUTE
    * STATISTICS` tier stock Spark offers but temp views cannot hold.
    *
    * Why this exists at 100 TB: the temp-view path plans joins from FILE
    * SIZES (and AQE's runtime stats). Catalog row counts + column NDV/
    * min/max let the cost-based optimizer pick broadcast sides and join
    * orders AT PLAN TIME — before a single task runs — which is the only
    * timing that can avoid scheduling a shuffle stage at all, and it
    * keeps working when AQE's runtime numbers arrive too late (the first
    * exchange already materialized). Enable `spark.sql.cbo.enabled` (and
    * `spark.sql.cbo.joinReorder.enabled`) to let the stats drive plans.
    *
    * H1 interplay: if the files carry the driver's nanosecond `ts` LONG,
    * the stats-bearing table is registered as `<name>__files` and `name`
    * becomes a temp view applying the ingest rewrite — scans under the
    * view still carry the catalog stats (a view is just a plan alias).
    * Stats are a SNAPSHOT: Spark does not auto-refresh them, and a stale
    * "small" estimate broadcasts a no-longer-small side — call
    * [[refreshStats]] after every append/rewrite of the location. */
  /** ANALYZE the given columns; those in `histogramColumns` additionally
    * get an EQUI-HEIGHT HISTOGRAM (254 buckets of ~equal row count).
    * Plain NDV/min/max costing assumes a UNIFORM value distribution —
    * on a skewed column, a range/equality filter's selectivity estimate
    * can be off by the skew factor (a `k > 0` filter over a column that
    * is 99% zeros estimates ~100% of rows without a histogram, <1% with
    * one), and that mis-estimate is exactly what flips a
    * broadcast-vs-shuffle join decision (PlanSpec pins the flip). The
    * histogram costs one extra percentile pass per column at ANALYZE
    * time, so it is opt-in per column — spend it on the skewed
    * join/filter keys, not every column. The conf flag is only read by
    * ANALYZE itself; it is set for the statement and restored. */
  private def analyzeCols(spark: SparkSession, tableName: String,
                          cols: Seq[String], histogram: Boolean): Unit = {
    require(cols.forall(!_.contains("`")),
      s"illegal column name: ${cols.mkString(", ")}")
    if (cols.nonEmpty) {
      val key = "spark.sql.statistics.histogram.enabled"
      val prev = spark.conf.getOption(key)
      try {
        // Only FORCE the flag ON for histogramColumns; plain columns run
        // under the AMBIENT conf — a user who opted in session-wide must
        // not silently lose histograms on their analyzeColumns.
        if (histogram) spark.conf.set(key, "true")
        spark.sql(s"ANALYZE TABLE `$tableName` COMPUTE STATISTICS FOR COLUMNS " +
          cols.map(c => s"`$c`").mkString(", "))
      } finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  def registerAnalyzed(spark: SparkSession, name: String, path: String,
                       format: String = "parquet",
                       analyzeColumns: Seq[String] = Nil,
                       histogramColumns: Seq[String] = Nil): DataFrame = {
    Graft.configure(spark)
    require(!name.contains("`"), s"illegal table name: $name")
    // `format` is interpolated raw into the DDL (USING $format) — pin it
    // to identifier shape so it cannot smuggle SQL into the statement.
    require(format.matches("[A-Za-z0-9_.]+"), s"illegal format: $format")
    val observed = spark.read.format(format).load(path)
    val needsH1 = observed.schema.find(_.name == "ts").exists(_.dataType == LongType)
    val tableName = if (needsH1) s"${name}__files" else name
    // Single quotes in the path double per SQL string-literal rules.
    spark.sql(s"CREATE TABLE IF NOT EXISTS `$tableName` USING $format " +
      s"LOCATION '${path.replace("'", "''")}'")
    // CREATE IF NOT EXISTS is a silent no-op over a pre-existing entry —
    // verify the catalog location matches the argument or the stats (and
    // the returned frame) would silently describe the OLD path (same
    // hazard Bucketed.register guards; shared scheme-aware comparison in
    // CatalogGuard so s3://...-style cluster URIs work too).
    CatalogGuard.requireLocation(spark, tableName, path)
    // Partitioned layouts (`batch=N/...` — every loop-landed lake):
    // schema inference sees the partition column, but the catalog entry
    // starts with ZERO registered partitions, so ANALYZE would honestly
    // report an empty table. Recover them — and again on every
    // refreshStats, since loop folds ADD partition directories.
    if (CatalogGuard.metadata(spark, tableName).partitionColumnNames.nonEmpty)
      spark.sql(s"ALTER TABLE `$tableName` RECOVER PARTITIONS")
    spark.sql(s"ANALYZE TABLE `$tableName` COMPUTE STATISTICS")
    analyzeCols(spark, tableName,
      analyzeColumns.filterNot(histogramColumns.contains), histogram = false)
    analyzeCols(spark, tableName, histogramColumns, histogram = true)
    if (needsH1) {
      h1(spark.table(tableName)).createOrReplaceTempView(name)
      spark.table(name)
    } else spark.table(tableName)
  }

  /** Re-compute the catalog statistics of a [[registerAnalyzed]] table
    * after its location grew (ManifestLoop/append-style folds) or was
    * rewritten. Stats are a SNAPSHOT of one directory state: after an
    * append the planner still sees the OLD row counts, and a stale
    * "small" estimate broadcasts a no-longer-small side — at scale that
    * is a driver/executor OOM, not a slowdown, which is WORSE than never
    * having stats. So any loop that appends to an analyzed location must
    * call this at its fold boundary (cheap relative to the fold: ANALYZE
    * without column stats is a count-shaped scan of the new snapshot;
    * pass the join/filter keys as `analyzeColumns` only when NDV/min/max
    * staleness is also load-bearing).
    *
    * `REFRESH TABLE` first: Spark caches the file listing per table, so
    * ANALYZE over the un-refreshed entry would re-scan the OLD file set
    * and "refresh" the stats to the same stale numbers. Resolves the H1
    * `<name>__files` indirection registerAnalyzed may have created. */
  def refreshStats(spark: SparkSession, name: String,
                   analyzeColumns: Seq[String] = Nil,
                   histogramColumns: Seq[String] = Nil): Unit = {
    require(!name.contains("`"), s"illegal table name: $name")
    val tableName =
      if (spark.catalog.tableExists(s"${name}__files")) s"${name}__files" else name
    require(spark.catalog.tableExists(tableName),
      s"no catalog table `$name` — registerAnalyzed it first")
    // New partition directories since the last refresh (loop folds)
    // are invisible until recovered; then refresh the cached listing.
    if (CatalogGuard.metadata(spark, tableName).partitionColumnNames.nonEmpty)
      spark.sql(s"ALTER TABLE `$tableName` RECOVER PARTITIONS")
    spark.sql(s"REFRESH TABLE `$tableName`")
    spark.sql(s"ANALYZE TABLE `$tableName` COMPUTE STATISTICS")
    analyzeCols(spark, tableName,
      analyzeColumns.filterNot(histogramColumns.contains), histogram = false)
    analyzeCols(spark, tableName, histogramColumns, histogram = true)
  }

  private val registeredKey = "spark.graft.catalog.dir"

  /** Register one fixture table as a STATS-BEARING view (round 15): an
    * engine-owned external catalog table `<name>__files` over the parquet
    * path, `ANALYZE ... COMPUTE STATISTICS` (table-level only: row count +
    * size — a footer-speed count job per table, no data columns read), and
    * the user-visible temp view `name` on top (H1 nanos rewrite applied as
    * everywhere else).
    *
    * Why (guide §3.1/§7.2, measured round 15): temp views over bare
    * parquet plan joins from FILE SIZES, and a mis-estimate picks the
    * build side of a broadcast join at PLAN time — the bench's
    * q_join3/q_join5 built a 600k-row hashed relation of `lineitem`
    * (33 MiB) on the driver EVERY run while the 3k-row filtered side
    * streamed. Row-count stats + CBO flip the build side (lineitem
    * streams, the small join output broadcasts): q_join3 0.90 s → 0.47 s,
    * q_join5 0.95 s → 0.61 s at sf0.1. At 100 TB the same mis-estimate is
    * a driver OOM, not a slowdown.
    *
    * A dir switch within one JVM (test suites hop sf0.001/sf0.01/sf0.1)
    * drops and re-creates the engine-owned `__files` entry — external
    * tables, so DROP never touches data files. */
  private def registerStatsView(spark: SparkSession, name: String, path: String): Unit = {
    val tbl = s"${name}__files"
    if (spark.catalog.tableExists(tbl) &&
        !CatalogGuard.locationMatches(spark, tbl, path))
      spark.sql(s"DROP TABLE `$tbl`")
    spark.sql(s"CREATE TABLE IF NOT EXISTS `$tbl` USING parquet " +
      s"LOCATION '${path.replace("'", "''")}'")
    spark.sql(s"ANALYZE TABLE `$tbl` COMPUTE STATISTICS")
    h1(spark.table(tbl)).createOrReplaceTempView(name)
  }

  /** Register all tables of `dir` as temp views over stats-bearing catalog
    * tables (one footer-speed ANALYZE count job per table — see
    * [[registerStatsView]]); idempotent per (session, dir). */
  def register(spark: SparkSession, dir: String): SparkSession = {
    Graft.configure(spark)
    if (!spark.conf.getOption(registeredKey).contains(dir)) {
      tableNames.foreach(n => registerStatsView(spark, n, s"$dir/$n.parquet"))
      spark.conf.set(registeredKey, dir)
    }
    spark
  }
}
