package graft.ops

import java.util.Locale

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** robots.txt (Robots Exclusion Protocol, RFC 9309) parsing and
  * crawl-frontier filtering — the politeness gate a fetch pipeline runs
  * between frontier generation and fetching.
  *
  * Semantics implemented per the RFC:
  *   - GROUPS: consecutive `User-agent:` lines open a group that the
  *     following `Allow:`/`Disallow:` rules belong to; a crawler obeys
  *     the most specific matching group — the longest agent product
  *     token that prefix-matches its own (case-insensitive), with `*`
  *     as the fallback — and if several groups name the SAME token,
  *     their rules merge.
  *   - RULES: patterns match the URL path from the first octet; `*`
  *     matches any octet sequence, a trailing `$` anchors the end.
  *     The MOST SPECIFIC rule wins (longest pattern octet count), with
  *     `Allow` winning length ties; no matching rule, an empty
  *     `Disallow:`, or a missing/unparseable robots.txt all mean
  *     ALLOWED (the protocol is opt-out).
  *   - Unknown directives and comments (`#`) are ignored; bare CR/LF
  *     both terminate lines.
  *
  * Everything is plain JVM parsing (the same posture as [[Warc]]):
  * malformed input degrades to permissive, never throws on data.
  */
object Robots {

  /** One access rule: `allow` + the raw pattern (as written, `*`/`$`
    * significant). */
  final case class Rule(allow: Boolean, pattern: String)

  /** Parse `txt` and return the rules of the group a crawler named
    * `agent` must obey (RFC group selection; Nil = everything allowed). */
  def parse(txt: String, agent: String = "*"): Seq[Rule] = {
    if (txt == null) return Nil
    val a = agent.toLowerCase(Locale.ROOT)
    // (uaToken, rules) per group; consecutive UA lines share the group.
    val groups = Seq.newBuilder[(String, Vector[Rule])]
    var uas = Vector.empty[String]
    var rules = Vector.empty[Rule]
    var inRules = false
    def flush(): Unit = {
      if (uas.nonEmpty) uas.foreach(u => groups += ((u, rules)))
      uas = Vector.empty; rules = Vector.empty
    }
    txt.split("[\r\n]+").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i > 0) {
        val key = line.take(i).trim.toLowerCase(Locale.ROOT)
        val value = line.drop(i + 1).trim
        key match {
          case "user-agent" =>
            if (inRules) { flush(); inRules = false }
            uas :+= value.toLowerCase(Locale.ROOT)
          case "allow" | "disallow" =>
            inRules = true
            // An empty Disallow is the classic "allow everything" idiom —
            // no rule at all; an empty Allow is equally vacuous.
            if (value.nonEmpty && uas.nonEmpty)
              rules :+= Rule(allow = key == "allow", pattern = value)
          case _ =>
            // ANY non-user-agent directive CLOSES the group — recognized
            // (crawl-delay, sitemap) or unknown (Host:, Clean-param:,
            // vendor extensions): in "User-agent: a / Host: x /
            // User-agent: b / Disallow: /" agent a's group ends at the
            // Host line, so b opens a FRESH group and a is not bound by
            // b's rules. This is the google/robotstxt separator class
            // (any line that is neither user-agent nor a rule);
            // [[crawlDelay]] uses the same separators, so the two
            // parsers see identical groups. Under-blocking an agent
            // whose group holds only unknown directives beats
            // over-blocking it with a stranger's rules.
            inRules = true
        }
      }
    }
    flush()
    val all = groups.result()
    // Most specific group: longest UA token that prefix-matches the
    // agent; '*' is the fallback. Same-token groups merge.
    val named = all.filter { case (u, _) => u != "*" && a.startsWith(u) }
    if (named.nonEmpty) {
      val best = named.map(_._1.length).max
      named.collect { case (u, r) if u.length == best => r }.flatten
    } else all.collect { case ("*", r) => r }.flatten
  }

  /** REP pattern match: from the first path octet, `*` = any sequence,
    * trailing `$` = end anchor. An unanchored pattern is a PREFIX match,
    * which is exactly a full glob match of `pattern + "*"` — one
    * iterative greedy-with-backtrack glob covers both forms,
    * O(path·pattern) worst case, no regex compilation per call. */
  def matches(pattern: String, path: String): Boolean = {
    val p =
      if (pattern.endsWith("$")) pattern.dropRight(1)
      else pattern + "*"
    var pi = 0; var si = 0
    var starPi = -1; var starSi = -1
    while (si < path.length) {
      if (pi < p.length && p.charAt(pi) == path.charAt(si)) { pi += 1; si += 1 }
      else if (pi < p.length && p.charAt(pi) == '*') { starPi = pi; pi += 1; starSi = si }
      else if (starPi >= 0) { pi = starPi + 1; starSi += 1; si = starSi }
      else return false
    }
    while (pi < p.length && p.charAt(pi) == '*') pi += 1
    pi == p.length
  }

  /** Longest-match verdict over a parsed rule set (allow wins ties);
    * no matching rule = allowed. */
  def allowed(rules: Seq[Rule], path: String): Boolean = {
    val p = if (path == null || path.isEmpty) "/" else path
    var bestLen = -1
    var bestAllow = true
    rules.foreach { r =>
      if (r.pattern.length > bestLen ||
          (r.pattern.length == bestLen && r.allow && !bestAllow)) {
        if (matches(r.pattern, p)) {
          bestLen = r.pattern.length; bestAllow = r.allow
        }
      }
    }
    bestAllow
  }

  /** One-call form: parse + verdict. */
  def allowed(txt: String, agent: String, path: String): Boolean =
    allowed(parse(txt, agent), path)

  /** `Sitemap:` URLs, in file order — group-independent per the RFC
    * (they belong to the file, not to any user-agent group); the
    * frontier SEEDING side of the protocol, where [[frontierFilter]] is
    * the gating side. */
  def sitemaps(txt: String): Seq[String] =
    if (txt == null) Nil
    else txt.split("[\r\n]+").toSeq.flatMap { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i > 0 && line.take(i).trim.equalsIgnoreCase("sitemap")) {
        val v = line.drop(i + 1).trim
        if (v.nonEmpty) Some(v) else None
      } else None
    }

  /** `Crawl-delay` (non-RFC but widely served) for the group `agent`
    * obeys — the politeness scheduler's per-host rate input. Group
    * selection matches [[parse]]; a non-numeric or absent value is
    * None. */
  def crawlDelay(txt: String, agent: String = "*"): Option[Double] = {
    if (txt == null) return None
    val a = agent.toLowerCase(Locale.ROOT)
    var uas = Vector.empty[String]
    var inRules = false
    val found = Vector.newBuilder[(String, Double)]
    txt.split("[\r\n]+").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i > 0) {
        val key = line.take(i).trim.toLowerCase(Locale.ROOT)
        val value = line.drop(i + 1).trim
        key match {
          case "user-agent" =>
            if (inRules) { uas = Vector.empty; inRules = false }
            uas :+= value.toLowerCase(Locale.ROOT)
          case "crawl-delay" =>
            inRules = true
            value.toDoubleOption.foreach(d => uas.foreach(u => found += ((u, d))))
          case "allow" | "disallow" | "sitemap" => inRules = true
          case _ =>
            // Same separator class as [[parse]]: ANY non-user-agent
            // directive (recognized or unknown — Host:, Clean-param:,
            // vendor extensions) closes the group, so the two parsers
            // see identical groups and a later group's Crawl-delay never
            // leaks to an earlier group separated by an unknown line.
            inRules = true
        }
      }
    }
    val all = found.result()
    val named = all.filter { case (u, _) => u != "*" && a.startsWith(u) }
    if (named.nonEmpty) Some(named.maxBy(_._1.length)._2)
    else all.collectFirst { case ("*", d) => d }
  }

  /** Crawl-frontier politeness filter: keep the `urls` rows whose path
    * the host's robots.txt allows for `agent`. `robots` carries one
    * `(host, txt)` row per host (the fetch layer's robots cache — at
    * web scale a few 1e8 small rows); hosts with NO robots row are
    * allowed (the protocol is opt-out). Scale shape: host extraction is
    * a projection, the robots attach is an EQUI join on host (broadcast
    * under AQE when the cache is small, shuffled hash otherwise —
    * never a pair join), and the verdict is a typed per-partition pass
    * with a per-host parsed-rule memo, so a host's robots.txt parses
    * once per (partition, host), not once per URL. The join key is the
    * AUTHORITY as served, lowercased, userinfo stripped, PORT KEPT —
    * RFC 9309 scopes a robots.txt to its scheme+authority, so
    * `example.com:8080` is a different robots target than
    * `example.com`; key the robots cache exactly as the fetcher
    * resolved the authority. Duplicate cache rows for one host (messy
    * fetch logs) are collapsed deterministically to the LONGEST txt
    * (ties lexicographic) rather than duplicating frontier rows through
    * the join. */
  def frontierFilter(urls: DataFrame, urlCol: Column,
                     robots: DataFrame, hostCol: Column, txtCol: Column,
                     agent: String = "*"): DataFrame = {
    val withHp = urls.withColumn("__host",
        lower(regexp_extract(urlCol,
          "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/?#]+)", 1)))
      .withColumn("__path",
        coalesce(nullif(regexp_extract(urlCol,
          "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1), lit("")), lit("/")))
    val r = robots
      .select(lower(hostCol).as("__rhost"), txtCol.as("__txt"))
      .groupBy("__rhost")
      .agg(max_by(col("__txt"), struct(length(col("__txt")), col("__txt")))
        .as("__txt"))
    val joined: Dataset[Row] =
      withHp.join(r, col("__host") === col("__rhost"), "left")
    val txtIdx = joined.columns.length - 1
    val pathIdx = joined.columns.indexOf("__path")
    val keep = joined.mapPartitions { rows =>
      // Per-partition memo: one parse per distinct robots text, not per URL.
      val memo = scala.collection.mutable.HashMap.empty[String, Seq[Rule]]
      rows.filter { row =>
        if (row.isNullAt(txtIdx)) true
        else {
          val rules = memo.getOrElseUpdate(row.getString(txtIdx),
            parse(row.getString(txtIdx), agent))
          allowed(rules, row.getString(pathIdx))
        }
      }
    }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(joined.schema))
    keep.drop("__host", "__path", "__rhost", "__txt")
  }
}
