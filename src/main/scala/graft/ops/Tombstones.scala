package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shared TOMBSTONE kernel of every persisted index family (IVF /
  * LSH / PQ / banded near-dup / SemDeDup state / BM25 postings): one
  * spelling of the takedown contract that was previously re-implemented
  * per family — same layout, same hygiene, same crash posture — so a
  * deletion-ordering or path-layout defect gets fixed ONCE (the
  * motivating bug class: ClusterLoop's compaction deletion order,
  * fixed per-copy in round 13).
  *
  * The contract:
  *  - Deletes are MARKS, not rewrites: a bucketed table cannot rewrite
  *    single files without breaking Spark's bucket-file naming
  *    contract, and takedown batches are tiny against an index.
  *  - Marks live in `<path>_tombstones` — a small parquet id list
  *    BESIDE the index, append-only (crash-safe and idempotent: reads
  *    dedup; re-appending a batch changes nothing).
  *  - The LIVE view filters with a BROADCAST anti join, so the index's
  *    bucketed layout — and every Exchange-free probe join over it —
  *    survives the filter.
  *  - Deletion returns the batch's live count in the PHYSICAL index
  *    (0 = no-op: never indexed or already deleted); tombstones are
  *    recorded regardless, so delete-then-append races resolve to
  *    deleted.
  *  - Compaction rewrites live rows to a FRESH path, never in place
  *    (the [[graft.sources.Maintenance.compact]] rule) — families keep
  *    their own persist schemas and call [[requireFreshPath]].
  *
  * Families keep their public names (`ivfTombstones`,
  * `deleteFromPqIndex`, …) as thin delegates; the BM25 family composes
  * these pieces in its own order because its takedown additionally
  * corrects corpus statistics between the two steps. */
private[graft] object Tombstones {

  /** Where a persisted index at `path` records removed ids. */
  def dir(path: String): String = s"${path}_tombstones"

  /** The current tombstone id set (deduped; empty LONG-typed frame when
    * none have been recorded — every family stores long ids). */
  def ids(spark: SparkSession, path: String, idCol: String): DataFrame = {
    val d = dir(path)
    val (fs, p) = graft.sources.LakeFs.resolve(d)
    if (fs.exists(p)) spark.read.parquet(d).select(col(idCol)).distinct()
    else spark.range(0).select(col("id").as(idCol)).limit(0)
  }

  /** Normalize a caller's one-column id frame to the family's key:
    * single column enforced, optional long cast, nulls dropped (they
    * cannot match an indexed row), deduped, pinned. */
  def normalize(idsDf: DataFrame, idCol: String,
                castLong: Boolean): DataFrame = {
    require(idsDf.columns.length == 1, "ids must be a single id column")
    val c0 = col(idsDf.columns.head)
    idsDf.select((if (castLong) c0.cast("long") else c0).as(idCol))
      .where(col(idCol).isNotNull).distinct().localCheckpoint()
  }

  /** Record a (normalized) deletion batch: count how many of its ids
    * are LIVE in the physical index (`physIds` = the physical key
    * column, duplicates fine — counted distinct via the semi probe
    * shape callers used: one row per physical row), then append the
    * marks. Returns the live row count (0 = no-op batch). */
  def recordDeletes(spark: SparkSession, path: String, idCol: String,
                    batch: DataFrame, physIds: DataFrame): Long = {
    val live = physIds
      .join(ids(spark, path, idCol), Seq(idCol), "left_anti")
      .join(batch, Seq(idCol), "left_semi").count()
    batch.write.mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(dir(path))
    live
  }

  /** The LIVE view: `attached` minus tombstoned ids, broadcast anti
    * join (the takedown-bounded set never disturbs the bucketing). */
  def liveFilter(attached: DataFrame, spark: SparkSession,
                 path: String, idCol: String): DataFrame =
    attached.join(broadcast(ids(spark, path, idCol)), Seq(idCol), "left_anti")

  /** The never-in-place compaction rule, spelled once. */
  def requireFreshPath(path: String, newPath: String, op: String): Unit =
    require(graft.sources.LakeFs.canonical(newPath) !=
      graft.sources.LakeFs.canonical(path),
      s"$op never rewrites in place — write to a new path and swap")
}
