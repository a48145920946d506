package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Hadoop-`FileSystem` access for the lake tooling ([[FileStats]],
  * [[Maintenance]], [[graft.streaming.VersionedState]]). The 100 TB
  * regime those features exist for lives on object storage, so every
  * walk/list/size goes through `org.apache.hadoop.fs.FileSystem` — the
  * same abstraction Spark's own scans use — never `java.nio`: a bare
  * local path, a `file:` URI, and an `s3a://`/`hdfs://` URI all resolve
  * to the filesystem their scheme names, with the active session's
  * Hadoop configuration (credentials, endpoints) applied.
  */
private[graft] object LakeFs {

  /** The active session's Hadoop conf (S3 credentials, endpoints, ...);
    * a bare default when no session exists yet (pure-path helpers). */
  def hadoopConf: Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  /** Resolve a path or URI to its filesystem and fully-qualified path. */
  def resolve(dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(hadoopConf)
    (fs, fs.makeQualified(p))
  }

  /** All regular files under `dir` (recursive), optionally skipping files
    * under underscore/dot-prefixed SUBdirectories — Spark's reader hides
    * those (`_stats`, `.checkpoint`), so listings that feed staleness
    * comparisons must hide them too. Returns fully-qualified
    * scheme-carrying paths.
    *
    * Two walk strategies by scheme: object stores and HDFS use
    * `fs.listFiles(recursive)` — one flat LIST prefix scan on S3A,
    * batched located-status RPCs on HDFS. The LOCAL filesystem gets a
    * plain `listStatus` walk instead: `listFiles`' per-file
    * block-location materialization costs ~4 ms/file there (measured
    * 134 ms vs 1.2 ms for a 32-file directory — it dominated every
    * [[FileStats.prunedRead]] probe), while a directory-recursive
    * `listStatus` is a handful of stat syscalls. */
  def listFiles(dir: String, skipHiddenDirs: Boolean): Seq[(String, Long)] = {
    val (fs, root) = resolve(dir)
    if (!fs.exists(root)) return Nil
    def keepDir(name: String): Boolean =
      !skipHiddenDirs || !(name.startsWith("_") || name.startsWith("."))
    if (fs.getScheme == "file") {
      val b = Seq.newBuilder[(String, Long)]
      def walk(p: Path): Unit = fs.listStatus(p).foreach { st =>
        if (st.isDirectory) { if (keepDir(st.getPath.getName)) walk(st.getPath) }
        else b += ((st.getPath.toString, st.getLen))
      }
      walk(root)
      b.result()
    } else {
      val rootPrefix = root.toString.stripSuffix("/") + "/"
      val it = fs.listFiles(root, true)
      val b = Seq.newBuilder[(String, Long)]
      while (it.hasNext) {
        val st = it.next()
        val full = st.getPath.toString
        val hidden = skipHiddenDirs && {
          val rel = full.stripPrefix(rootPrefix)
          val segs = rel.split('/')
          segs.dropRight(1).exists(s => s.startsWith("_") || s.startsWith("."))
        }
        if (!hidden) b += ((full, st.getLen))
      }
      b.result()
    }
  }

  /** Canonical fully-qualified form of `dir` for same-location guards
    * (compact/zorder's never-in-place rule): resolve through the scheme's
    * filesystem — `fs.resolvePath` when the path exists (symlinks
    * resolved, the strongest identity the filesystem offers), otherwise
    * qualification of a dot-segment-collapsed path, so `x/../t` and
    * symlinked aliases of the same directory compare equal whether they
    * live on `file:`, `hdfs://`, or `s3a://`. */
  def canonical(dir: String): Path = {
    val (fs, q) = resolve(dir)
    try fs.resolvePath(q)
    catch { case _: java.io.IOException =>
      val segs = q.toUri.getPath.split('/').foldLeft(List.empty[String]) {
        case (acc, "" | ".")     => acc
        case (_ :: tail, "..")   => tail
        case (acc, s)            => s :: acc
      }.reverse
      fs.makeQualified(new Path(segs.mkString("/", "/", "")))
    }
  }

  /** Normalize a file path/URI string for identity comparison across the
    * spellings the same file takes on: `input_file_name()` renders
    * `file:///x`, a Hadoop walk renders `file:/x`, a caller may pass a
    * bare `/x`. Rule: drop the scheme, collapse leading slashes — applied
    * identically to both sides of any comparison, so `s3a://bucket/k`
    * (→ `/bucket/k`) still cannot collide with a DIFFERENT bucket or
    * key. Percent-escaped paths (a space in a directory name) are NOT
    * decoded; a mismatch surfaces as a loud staleness error, never as a
    * silent wrong join. */
  def normPath(s: String): String =
    s.replaceFirst("^[A-Za-z][A-Za-z0-9+.-]*:", "").replaceFirst("^/+", "/")
}
