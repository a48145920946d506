package graft.ops

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Outlink extraction — the WAT step of the web-graph pipeline: href
  * scraping conventions, RFC-3986 resolution edge cases, the exploded
  * links() DataFrame over real archive bytes, and the host-graph /
  * authority reductions on top. */
class WarcLinkSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def crlf(lines: String*): Array[Byte] =
    lines.mkString("", "\r\n", "\r\n").getBytes(StandardCharsets.UTF_8)

  private def warcResponse(uri: Option[String], html: String): Array[Byte] = {
    val p = html.getBytes(StandardCharsets.UTF_8)
    val http = crlf("HTTP/1.1 200 OK", "Content-Type: text/html; charset=utf-8",
      s"Content-Length: ${p.length}", "") ++ p
    val head = crlf(Seq("WARC/1.0", "WARC-Type: response") ++
      uri.map(u => s"WARC-Target-URI: $u").toSeq ++ Seq(
      "WARC-Date: 2024-01-02T03:04:05Z",
      s"Content-Length: ${http.length}", ""): _*)
    head ++ http ++ "\r\n\r\n".getBytes(StandardCharsets.US_ASCII)
  }

  private def gz(parts: Array[Byte]*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    parts.foreach { p =>
      val g = new GZIPOutputStream(out); g.write(p); g.finish()
    }
    out.toByteArray
  }

  test("extractHrefs: quote styles, entities, attribute order, non-anchors") {
    val html =
      """<html><body>
        |<a href="https://a.org/x?p=1&amp;q=2">double</a>
        |<a class="nav" id=z href='b.html'>single, href not first</a>
        |<a href=c.html rel=nofollow>unquoted</a>
        |<a href="  /pad  ">padded</a>
        |<a href="">empty drops</a>
        |<a name="anchor-without-href">no href</a>
        |<link href="style.css"><img src="i.png">
        |<A HREF="UPPER.html">case-insensitive tag</A>
        |</body></html>""".stripMargin
    assert(Warc.extractHrefs(html) == Seq(
      "https://a.org/x?p=1&q=2", "b.html", "c.html", "/pad", "UPPER.html"))
  }

  test("resolveUrl: RFC-3986 resolution with crawl-grade degradation") {
    val base = "http://h.org/d/p.html"
    // The spec table: relative, dot segments, root, protocol-relative,
    // absolute, query-only.
    assert(Warc.resolveUrl(base, "a.html").contains("http://h.org/d/a.html"))
    assert(Warc.resolveUrl(base, "../x/y.html").contains("http://h.org/x/y.html"))
    assert(Warc.resolveUrl(base, "/root.html").contains("http://h.org/root.html"))
    assert(Warc.resolveUrl(base, "//other.org/z").contains("http://other.org/z"))
    assert(Warc.resolveUrl(base, "https://abs.org/x").contains("https://abs.org/x"))
    assert(Warc.resolveUrl(base, "?q=2").contains("http://h.org/d/?q=2"))
    // Fragment cut before resolving; pure-fragment self links drop.
    assert(Warc.resolveUrl(base, "a.html#sec").contains("http://h.org/d/a.html"))
    assert(Warc.resolveUrl(base, "#sec").isEmpty)
    // Non-web schemes drop.
    assert(Warc.resolveUrl(base, "mailto:x@y.org").isEmpty)
    assert(Warc.resolveUrl(base, "javascript:void(0)").isEmpty)
    assert(Warc.resolveUrl(base, "data:text/plain,hi").isEmpty)
    // Excess .. stripped the way browsers strip it (JDK leaves /../).
    assert(Warc.resolveUrl("http://h.org/d/p", "z/../../../w")
      .contains("http://h.org/w"))
    // Spaces pre-escape; other junk degrades to None, never throws.
    assert(Warc.resolveUrl(base, "a b.html").contains("http://h.org/d/a%20b.html"))
    assert(Warc.resolveUrl(base, "http://h.org/{bad}").isEmpty)
    assert(Warc.resolveUrl("not a base ::", "a.html").isEmpty)
    // Underscore hostnames are legal in the wild (JDK nulls getHost).
    assert(Warc.resolveUrl("http://my_host.example.com/a/", "b")
      .contains("http://my_host.example.com/a/b"))
    // Ports survive; empty-path base resolves from root.
    assert(Warc.resolveUrl("http://h.org:8080/d/", "x")
      .contains("http://h.org:8080/d/x"))
    assert(Warc.resolveUrl("http://h.org", "a.html").contains("http://h.org/a.html"))
  }

  test("links(): exploded DataFrame resolves per record; no-URI keeps absolute only") {
    import spark.implicits._
    val pageA =
      """<html><body><a href="b.html">rel</a>
        |<a href="https://ext.org/z?p=1&amp;q=2">abs</a>
        |<a href="#top">self</a><a href="mailto:x@y">mail</a></body></html>"""
        .stripMargin
    val pageNoUri =
      """<a href="https://kept.org/x">abs survives</a>
        |<a href="lost.html">relative drops without a base</a>"""
        .stripMargin
    val assets = Seq(
      (1L, gz(warcResponse(Some("http://site.org/dir/a.html"), pageA))),
      (2L, gz(warcResponse(None, pageNoUri))),
      (3L, "garbage".getBytes)).toDF("asset_id", "payload")
    val out = Warc.links(assets, col("asset_id"), col("payload"))
      .orderBy("asset_id", "dst_url").collect()
    assert(out.map(r => (r.getLong(0), r.getString(3))).toSeq == Seq(
      (1L, "http://site.org/dir/b.html"),
      (1L, "https://ext.org/z?p=1&q=2"),
      (2L, "https://kept.org/x")))
    assert(out(0).getString(2) == "http://site.org/dir/a.html")
    assert(out(2).isNullAt(2), "no-URI record keeps a null src_url")
  }

  test("linkGraph + hostAuthority: canonical host fold, self-loop drop, hub wins") {
    import spark.implicits._
    // URL-level links: case/default-port variants of hub.org must fold
    // into ONE node; intra-host navigation must not become edges.
    val links = Seq(
      ("http://a.org/p1", "https://HUB.org/x"),
      ("http://a.org/p2", "https://hub.org:443/y?utm_source=f"),
      ("http://a.org/p2", "http://a.org/p9"), // self loop: dropped
      ("http://b.org/p", "https://hub.org/z"),
      ("http://c.org/p", "https://hub.org/z"),
      ("http://hub.org/out", "http://a.org/p1"),
      ("http://bad gap/p", "https://hub.org/z") // unparseable src degrades out
    ).toDF("src_url", "dst_url")
    val g = graft.api.Pipelines.linkGraph(links, col("src_url"), col("dst_url"))
      .orderBy("src", "dst").collect()
    assert(g.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq == Seq(
      ("a.org", "hub.org", 2L), ("b.org", "hub.org", 1L),
      ("c.org", "hub.org", 1L), ("hub.org", "a.org", 1L)))
    // 40 rounds: the a↔hub 2-cycle makes this graph nearly bipartite, so
    // ranks oscillate with period 2 and contract at d² per pair of
    // rounds — 8 iterations is demonstrably NOT converged here (a.org
    // transiently leads on even rounds).
    val ranks = graft.api.Pipelines
      .hostAuthority(links, col("src_url"), col("dst_url"), iterations = 40)
      .orderBy(desc("r")).collect()
    assert(ranks.head.getString(0) == "hub.org",
      "the host every other host links to must rank first")
    assert(ranks.map(_.getString(0)).toSet ==
      Set("a.org", "b.org", "c.org", "hub.org"))
  }

  test("links(): undecodable content-encoding yields no links (never parses garbage)") {
    import spark.implicits._
    val body = "fake-brotli-bytes".getBytes(StandardCharsets.UTF_8)
    val http = crlf("HTTP/1.1 200 OK", "Content-Type: text/html",
      "Content-Encoding: br", s"Content-Length: ${body.length}", "") ++ body
    val head = crlf("WARC/1.0", "WARC-Type: response",
      "WARC-Target-URI: http://x.org/", "WARC-Date: 2024-01-02T03:04:05Z",
      s"Content-Length: ${http.length}", "")
    val rec = head ++ http ++ "\r\n\r\n".getBytes(StandardCharsets.US_ASCII)
    val assets = Seq((1L, rec)).toDF("asset_id", "payload")
    assert(Warc.links(assets, col("asset_id"), col("payload")).count() == 0)
  }
}
