package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.util.Using

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Data-lake maintenance: the small-files problem is the dominant
  * operational failure mode of a 100 TB parquet lake (every file is a
  * task, a footer read, and a namenode entry — a million 1 MB files makes
  * a scan scheduler-bound, not IO-bound). [[compact]] rewrites a parquet
  * directory into ~`targetBytes` files.
  */
object Maintenance {

  /** Bytes of all regular files under `dir` (non-recursive data files +
    * nested partition dirs; parquet layouts are at most a few levels). */
  private def dirBytes(dir: String): Long =
    Using.resource(Files.walk(Paths.get(dir))) { walk =>
      walk.filter(Files.isRegularFile(_: Path))
        .mapToLong(Files.size(_: Path)).sum()
    }

  /** Number of output files [[compact]] would write for `dir`. */
  def plannedFiles(dir: String, targetBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    math.max(1, math.ceil(dirBytes(dir).toDouble / targetBytes).toInt)
  }

  /** Resolve to a canonical absolute path for the in-place guard: real
    * path (symlinks resolved) when the file exists, normalized absolute
    * path (`x/../y` collapsed) otherwise. */
  private def canonical(p: String): Path = {
    val abs = Paths.get(p).toAbsolutePath.normalize
    if (Files.exists(abs)) abs.toRealPath() else abs
  }

  /** Compact a parquet directory into ~`targetBytes` files at `outDir`.
    *
    * LOCAL-FILESYSTEM ONLY: sizing walks `java.nio` paths, so `dir` must
    * be a local directory (not an `hdfs://`/`s3://` URI — those fail the
    * walk up front rather than mis-sizing).
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
    require(canonical(outDir) != canonical(dir),
      "compact never rewrites in place — write to a new directory and swap")
    val n = plannedFiles(dir, targetBytes)
    val df = spark.read.parquet(dir)
    val sized = if (shuffle) df.repartition(n) else df.coalesce(n)
    sized.write.mode(SaveMode.ErrorIfExists).parquet(outDir)
    spark.read.parquet(outDir)
  }
}
