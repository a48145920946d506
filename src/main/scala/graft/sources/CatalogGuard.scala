package graft.sources

import java.net.URI

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.CatalogTable

/** Shared guard for the CREATE TABLE IF NOT EXISTS flows
  * ([[Bucketed.register]], [[Catalog.registerAnalyzed]]): IF NOT EXISTS
  * is a silent no-op over a pre-existing entry, so the catalog location
  * must be verified against the argument or a stale table is served with
  * stats/buckets attributed to the new path. */
private[sources] object CatalogGuard {

  private val schemeRe = "^[A-Za-z][A-Za-z0-9+.-]*:".r

  /** A location as (scheme, authority, normalized path), so `file:/x`,
    * `file:///x` and a bare local path compare equal while
    * `s3://bucket/x` keeps its scheme and bucket — a cluster URI must
    * neither be mangled through java.io.File nor collide with an
    * equal-pathed location on a different filesystem. */
  private[sources] def normalize(loc: String): (String, String, String) = {
    val u: URI =
      if (schemeRe.findFirstIn(loc).isDefined) URI.create(loc)
      else new java.io.File(loc).getAbsoluteFile.toURI
    normalize(u)
  }

  private[sources] def normalize(u: URI): (String, String, String) = (
    Option(u.getScheme).getOrElse("file"),
    Option(u.getAuthority).getOrElse(""),
    Option(u.getPath).map(p =>
        java.nio.file.Paths.get(p).normalize.toString.replaceAll("/+$", ""))
      .getOrElse(""))

  /** The catalog entry for `table`. */
  def metadata(spark: SparkSession, table: String): CatalogTable =
    spark.sessionState.catalog.getTableMetadata(TableIdentifier(table))

  /** Whether `table`'s catalog location is `path` (scheme-aware). */
  def locationMatches(spark: SparkSession, table: String, path: String): Boolean =
    normalize(metadata(spark, table).location) == normalize(path)

  /** Throw unless `table`'s catalog location is `path`. */
  def requireLocation(spark: SparkSession, table: String, path: String): Unit = {
    val meta = metadata(spark, table)
    require(normalize(meta.location) == normalize(path),
      s"table `$table` already registered at ${meta.location}, not $path — the " +
        "dataset moved; DROP TABLE (or use a per-run table name) before re-registering")
  }
}
