package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The SIGNED edge store shared by the streaming graph loops
  * ([[ClusterLoop]] over canonical undirected `(lo, hi)` pairs;
  * [[RankLoop]]/[[LabelLoop]] over directed `(src, dst)` edges): batch
  * dirs `edgesDir/batch=<id>` carrying `(k1, k2, sign, b)` — ONE row
  * per key tuple per batch, sign +1 for upserted edges (within-batch
  * remove+re-add nets to add, the Debezium-shaped convention
  * [[UpsertLoop]] uses), −1 for removals, `b` the batch id. The CURRENT
  * edge set is last-action-wins: `sign of max b` per tuple — NOT a sum
  * (set semantics: duplicate adds must not need two removals).
  *
  * Store semantics are declared cross-engine as q187 (the `max_by`
  * netting over an integer action log); ties inside one batch cannot
  * occur because [[canonBatch]] collapses a batch's events to one row
  * per tuple BEFORE the write.
  *
  * Crash posture: batch writes are deterministic Overwrite per batch id
  * (replay rewrites identical bytes); [[compact]] follows the
  * ClusterLoop discipline — batch-unique target name, a finished
  * (`_SUCCESS`) target is never rewritten, folded dirs delete in
  * ASCENDING batch order so a crash mid-delete can never leave a bare
  * +1 that would resurrect a net-removed edge. */
private[graft] object SignedEdgeStore {

  private def edgeSchema(k1: String, k2: String) = StructType(Seq(
    StructField(k1, StringType), StructField(k2, StringType)))

  def emptyEdges(spark: SparkSession, k1: String, k2: String): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], edgeSchema(k1, k2))

  /** The store OWNS only dirs matching its naming contract. Anything
    * else under `edgesDir` (another tool's spill, a crashed job's
    * leftover) is IGNORED everywhere — never read (schema-incompatible
    * content must not abort a fold or a compaction), never folded
    * (foreign rows must not become edges), never deleted (not ours). */
  private val ownedDir = "^batch=\\d+(_compact)?$".r

  /** The store's owned batch-dir paths (empty when the root is absent),
    * optionally excluding one dir by name. */
  def batchDirPaths(edgesDir: String,
                    excludeName: Option[String] = None): Seq[String] = {
    val (fs, root) = graft.sources.LakeFs.resolve(edgesDir)
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filter(p => ownedDir.matches(p.getName))
      .filter(p => !excludeName.contains(p.getName))
      .map(_.toString).toSeq
  }

  /** PER-DIR format contract: every owned dir must carry `sign`/`b`.
    * Dirs written by the old append-only loops don't, and reading them
    * through the netting would silently DROP their edges — parquet
    * schema sampling (mergeSchema off) takes the first listed footer,
    * so a mixed old+new store (the exact shape a resumed stream
    * produces: the new batch dir is written BEFORE the store read) can
    * read old rows as null-signed and net them to nothing. A unified-
    * schema check is therefore listing-order-dependent, not a
    * contract; this checks each dir's own footer (driver-side schema
    * reads, bounded by the compaction cadence). */
  private def requireSigned(spark: SparkSession, dirs: Seq[String]): Unit =
    dirs.foreach { d =>
      val cols = spark.read.parquet(d).columns
      require(cols.contains("sign") && cols.contains("b"),
        s"signed edge store dir $d lacks sign/b columns (a " +
          "pre-signed-format append-only store?) — rebuild the store (or " +
          "backfill sign=1, b=0 per dir) before resuming; reading it " +
          "through last-action netting would silently drop its edges")
    }

  /** Read the signed store (owned dirs only), loudly refusing any
    * pre-signed-format dir — see [[requireSigned]]. */
  def readStore(spark: SparkSession, edgesDir: String, k1: String, k2: String,
                excludeName: Option[String] = None): DataFrame = {
    val dirs = batchDirPaths(edgesDir, excludeName)
    if (dirs.isEmpty)
      return emptyEdges(spark, k1, k2)
        .select(col(k1), col(k2), lit(1).as("sign"), lit(0L).cast("bigint").as("b"))
        .limit(0)
    requireSigned(spark, dirs)
    spark.read.parquet(dirs: _*)
  }

  /** Net a signed slice (any frame carrying `k1, k2, sign, b`) to its
    * present edges under last-action-wins. Callers restrict the store
    * FIRST (cone / affected-slice semi joins) so this group-by runs on
    * the slice, never the store — the per-batch fold discipline; the
    * global form is [[current]]/[[compact]]'s cadence-amortized moment. */
  def net(signed: DataFrame, k1: String, k2: String): DataFrame =
    signed.groupBy(k1, k2).agg(max_by(col("sign"), col("b")).as("__s"))
      .where(col("__s") > 0).select(col(k1), col(k2))

  /** The store's current edge set `(k1, k2)` — one GLOBAL netting pass.
    * Exposed for spec twins, audits, and the loops whose fold genuinely
    * consumes the full edge set each batch (PageRank's matvec). */
  def current(spark: SparkSession, edgesDir: String,
              k1: String, k2: String): DataFrame =
    net(readStore(spark, edgesDir, k1, k2), k1, k2)

  /** Collapse a batch's events (`k1, k2, __rm` — nulls/self-loops
    * already handled by the caller's canonicalization) to one signed
    * action row per key tuple: the tuple is removed only if EVERY event
    * for it says removed (upsert beats removal within one batch).
    * Returns `(k1, k2, __allrm)`; pair with [[writeBatch]]. */
  def canonBatch(events: DataFrame, k1: String, k2: String): DataFrame =
    events.groupBy(k1, k2)
      .agg(min(when(col("__rm"), 1).otherwise(0)).as("__allrm"))

  /** Write a [[canonBatch]] frame as the batch's signed store dir —
    * deterministic Overwrite, so a crash replay rewrites identical
    * bytes. */
  def writeBatch(canon: DataFrame, k1: String, k2: String,
                 edgesDir: String, batchId: Long): Unit =
    canon.select(col(k1), col(k2),
        when(col("__allrm") === 1, -1).otherwise(1).as("sign"),
        lit(batchId).as("b"))
      .write.mode(SaveMode.Overwrite).parquet(s"$edgesDir/batch=$batchId")

  /** Net the signed store into one `batch=<id>_compact` dir (present
    * edges only, sign +1, b = the compaction batch id — every folded
    * action happened at a batch ≤ it), deleting the folded dirs.
    * Crash-safety shape: the target is batch-unique, a finished target
    * is never rewritten, and the loops' fold idempotence absorbs a
    * replay that sees the compacted store. Deletion runs in ASCENDING
    * batch order: for a net-REMOVED pair the +1 dir is always OLDER
    * than the −1 that killed it, so at any crash point the leftover
    * suffix either holds both actions or only the −1 — never a bare +1
    * that would resurrect the edge (compact rows carry the newest b, so
    * they dominate every leftover row for PRESENT edges, but a
    * net-removed edge has NO compact row to dominate with). Foreign
    * dirs under `edgesDir` are outside the naming contract and are
    * ignored wholesale — not read (unreadable content must not abort
    * compaction), not folded (foreign rows must not become edges),
    * not deleted (not ours). */
  def compact(spark: SparkSession, edgesDir: String, batchId: Long,
              k1: String, k2: String): Unit = {
    import org.apache.hadoop.fs.Path
    val tgtName = s"batch=${batchId}_compact"
    val (fs, root) = graft.sources.LakeFs.resolve(edgesDir)
    if (!fs.exists(root)) return
    val others = batchDirPaths(edgesDir, excludeName = Some(tgtName))
      .map(new Path(_))
    if (others.isEmpty) return
    val tgt = new Path(root, tgtName)
    if (!fs.exists(new Path(tgt, "_SUCCESS"))) {
      // Same per-dir format contract as readStore: compacting a store
      // holding a pre-signed-format dir would net its edges to nothing
      // and then DELETE the dir — silent loss made unrecoverable.
      requireSigned(spark, others.map(_.toString))
      net(spark.read.parquet(others.map(_.toString): _*), k1, k2)
        .select(col(k1), col(k2), lit(1).as("sign"), lit(batchId).as("b"))
        .write.mode(SaveMode.Overwrite).parquet(tgt.toString)
    }
    others.sortBy(p => p.getName.stripPrefix("batch=")
        .stripSuffix("_compact").toLongOption.getOrElse(Long.MinValue))
      .foreach(p => fs.delete(p, true))
  }
}
