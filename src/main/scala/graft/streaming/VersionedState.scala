package graft.streaming

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._
import scala.util.Using

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** The versioned-directory state store shared by the streaming state
  * loops ([[DedupLoop]], [[SketchLoop]]): `stateDir/v<N>` holds the state
  * after folding batches `0..N-1`; a version is VALID only with its
  * `_SUCCESS` marker (a crash mid-write leaves an ignorable partial);
  * batch N reads the latest valid version ≤ N, overwrites `v<N+1>`
  * (replay of an uncommitted batch rewrites it), and garbage-collects
  * versions older than the one it read — which no replay can need, since
  * a replayed batch id is never below the current one. Local filesystem,
  * like [[graft.sources.Maintenance]]. */
private[streaming] object VersionedState {

  def versionPath(stateDir: String, v: Long): String = s"$stateDir/v$v"

  /** Versions with a `_SUCCESS` marker — complete, readable state. */
  def validVersions(stateDir: String): Seq[Long] = {
    val root = Paths.get(stateDir)
    if (!Files.isDirectory(root)) Nil
    else Using.resource(Files.list(root)) { s =>
      s.iterator().asScala
        .flatMap { p =>
          val n = p.getFileName.toString
          if (n.startsWith("v") && n.drop(1).nonEmpty && n.drop(1).forall(_.isDigit) &&
              Files.exists(p.resolve("_SUCCESS"))) Some(n.drop(1).toLong)
          else None
        }
        .toSeq
    }
  }

  /** Latest valid version at or below `maxVersion` (the one batch
    * `maxVersion` must read). */
  def priorVersion(stateDir: String, maxVersion: Long): Option[Long] =
    validVersions(stateDir).filter(_ <= maxVersion).maxOption

  def read(spark: SparkSession, stateDir: String, v: Long,
           schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.foreach(r.schema)
    r.parquet(versionPath(stateDir, v))
  }

  /** Overwrite-write one version — deterministic content makes checkpoint
    * replay rewrite the same state. */
  def write(df: DataFrame, stateDir: String, v: Long): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(versionPath(stateDir, v))

  /** Seed `v0` with batch-era state; refuses to clobber an existing VALID
    * seed, but overwrites a `_SUCCESS`-less partial (a crash mid-seed
    * must not wedge the state dir until someone hand-deletes it). */
  def seed(df: DataFrame, stateDir: String): Unit = {
    val p = Paths.get(versionPath(stateDir, 0L))
    val partial = Files.exists(p) && !Files.exists(p.resolve("_SUCCESS"))
    df.write.mode(if (partial) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .parquet(versionPath(stateDir, 0L))
  }

  /** The latest valid version as a frame, if any state exists. */
  def latest(spark: SparkSession, stateDir: String,
             schema: Option[StructType] = None): Option[DataFrame] =
    validVersions(stateDir).maxOption.map(read(spark, stateDir, _, schema))

  /** Delete valid versions strictly below `keepFrom`. */
  def gcBelow(stateDir: String, keepFrom: Long): Unit =
    validVersions(stateDir).filter(_ < keepFrom).foreach { v =>
      val dir = Paths.get(versionPath(stateDir, v))
      Using.resource(Files.walk(dir)) { w =>
        w.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.deleteIfExists(_))
      }
    }
}
