package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC ingestion — the crawl-archive front door of a training-data
  * pipeline (Common Crawl ships WARC: per-record gzip members, WARC
  * headers, an HTTP message, then HTML). Pure JDK: gzip via
  * `java.util.zip` (multi-member streams read through), header parsing
  * and HTML text extraction are string work. Same honest salvage
  * posture as [[MediaCodecs]]: a malformed record ends that payload's
  * parse (records already parsed are kept), a non-WARC payload yields
  * no rows, nothing throws on data.
  *
  * Scale shape: one narrow `mapPartitions` over (id, payload) — archive
  * bytes never shuffle; the emitted rows carry only headers + extracted
  * text. Decompression and parsing are per-record, so memory is bounded
  * by the largest single record, not the archive.
  */
object Warc {

  /** Decompress a (possibly multi-member) gzip payload; non-gzip bytes
    * pass through unchanged (WARCs come both ways). Malformed gzip
    * yields the bytes decoded so far (salvage, never throw). */
  def gunzip(b: Array[Byte]): Array[Byte] = {
    if (b.length < 2 || (b(0) & 0xff) != 0x1f || (b(1) & 0xff) != 0x8b) return b
    val out = new ByteArrayOutputStream(b.length * 4)
    try {
      // GZIPInputStream reads concatenated members natively.
      val in = new GZIPInputStream(new ByteArrayInputStream(b))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    } catch { case _: java.io.IOException => () } // keep what decoded
    out.toByteArray
  }

  /** One parsed WARC record: headers + raw body bytes. */
  final case class WarcRecord(headers: Map[String, String], body: Array[Byte]) {
    def header(name: String): Option[String] = headers.get(name.toLowerCase)
  }

  /** Parse WARC records (version line, CRLF headers, Content-Length-framed
    * body, CRLF CRLF separator). Stops at the first malformed record. */
  def parseRecords(raw: Array[Byte]): Seq[WarcRecord] = {
    val b = gunzip(raw)
    val out = Seq.newBuilder[WarcRecord]
    var p = 0
    var ok = true
    def line(): Option[String] = {
      var q = p
      while (q + 1 < b.length && !(b(q) == '\r' && b(q + 1) == '\n')) q += 1
      if (q + 1 >= b.length) None
      else { val s = new String(b, p, q - p, StandardCharsets.UTF_8); p = q + 2; Some(s) }
    }
    while (ok && p < b.length) {
      // Skip inter-record blank lines.
      while (p + 1 < b.length && b(p) == '\r' && b(p + 1) == '\n') p += 2
      if (p >= b.length) ok = false
      else line() match {
        case Some(v) if v.startsWith("WARC/") =>
          var hs = Map.empty[String, String]
          var inHeaders = true
          while (inHeaders) line() match {
            case Some("") => inHeaders = false
            case Some(h) =>
              val i = h.indexOf(':')
              if (i > 0) hs += (h.take(i).trim.toLowerCase -> h.drop(i + 1).trim)
            case None => inHeaders = false; ok = false
          }
          val len = hs.get("content-length").flatMap(_.toLongOption)
          (len, ok) match {
            case (Some(n), true) if p + n <= b.length =>
              out += WarcRecord(hs, java.util.Arrays.copyOfRange(b, p, p + n.toInt))
              p += n.toInt
            case _ => ok = false // truncated or unframed body: stop, keep prior
          }
        case _ => ok = false
      }
    }
    out.result()
  }

  /** Split an HTTP message into (status, content-type, body bytes);
    * None if the body is not an HTTP message. */
  def httpSplit(body: Array[Byte]): Option[(Int, Option[String], Array[Byte])] = {
    if (body.length < 12 || !new String(body, 0, 5, StandardCharsets.US_ASCII)
        .equalsIgnoreCase("HTTP/")) return None
    var p = 0
    var headerEnd = -1
    while (headerEnd < 0 && p + 3 < body.length) {
      if (body(p) == '\r' && body(p + 1) == '\n' &&
          body(p + 2) == '\r' && body(p + 3) == '\n') headerEnd = p
      p += 1
    }
    if (headerEnd < 0) return None
    val head = new String(body, 0, headerEnd, StandardCharsets.UTF_8)
    val lines = head.split("\r\n")
    val status = lines.head.split(" ").lift(1).flatMap(_.toIntOption).getOrElse(return None)
    val ctype = lines.tail.collectFirst {
      case l if l.toLowerCase.startsWith("content-type:") => l.drop(13).trim
    }
    Some((status, ctype,
      java.util.Arrays.copyOfRange(body, headerEnd + 4, body.length)))
  }

  private val scriptStyle =
    "(?is)<(script|style)\\b[^>]*>.*?</\\1\\s*>".r
  private val comments = "(?s)<!--.*?-->".r
  private val tags = "(?s)<[^>]*>".r
  private val numEntity = "&#(x[0-9a-fA-F]{1,6}|[0-9]{1,7});".r

  /** HTML → whitespace-normalized plain text: script/style/comment blocks
    * drop whole, tags drop, block-ish tags become newlines before
    * stripping (so headings/paragraphs don't fuse into one word), the
    * common named entities plus all numeric entities decode. A
    * deterministic heuristic — the curation-grade extraction real
    * pipelines run before quality filters, not a browser. */
  def htmlToText(html: String): String = {
    var s = scriptStyle.replaceAllIn(html, " ")
    s = comments.replaceAllIn(s, " ")
    // Source newlines are layout, not content (browser semantics):
    // normalize them to spaces BEFORE block tags inject real breaks.
    s = s.replaceAll("[\\r\\n\\t]+", " ")
    s = "(?i)<(br|/p|/div|/h[1-6]|/li|/tr|/title)\\b[^>]*>".r.replaceAllIn(s, "\n")
    s = tags.replaceAllIn(s, " ")
    s = numEntity.replaceAllIn(s, m => {
      val g = m.group(1)
      val cp = if (g.charAt(0) == 'x' || g.charAt(0) == 'X')
        Integer.parseInt(g.substring(1), 16) else Integer.parseInt(g)
      if (Character.isValidCodePoint(cp) && !(cp >= 0xD800 && cp <= 0xDFFF) &&
          (cp >= 0x20 || cp == '\n'.toInt || cp == '\t'.toInt))
        java.util.regex.Matcher.quoteReplacement(new String(Character.toChars(cp)))
      else " "
    })
    s = s.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'").replace("&#39;", "'")
      .replace("&nbsp;", " ")
    s.split("\n").map(_.replaceAll("[ \\t\\x0B\\f\\r]+", " ").trim)
      .filter(_.nonEmpty).mkString("\n")
  }

  private val recordSchema = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("record_no", IntegerType, nullable = false),
    StructField("warc_type", StringType, nullable = true),
    StructField("uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("http_status", IntegerType, nullable = true),
    StructField("text", StringType, nullable = true)))

  /** Exploded WARC records per archive payload: `(asset_id, record_no,
    * warc_type, uri, warc_date, content_type, http_status, text)`.
    * `text` is the extracted plain text for HTML responses, the decoded
    * body for other `text/ *` responses, and null otherwise (binary
    * bodies are metadata-only rows — route them to the [[MediaCodecs]]
    * path instead). `content_type` prefers the HTTP header over the
    * WARC record header. One narrow mapPartitions; payload bytes never
    * shuffle; malformed archives degrade to however many records framed
    * cleanly. */
  def records(assets: DataFrame, id: Column, payload: Column): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(recordSchema)
    val in: Dataset[Row] = assets
      .select(id.cast("long").as("asset_id"), payload.as("payload"))
      .where(col("asset_id").isNotNull && col("payload").isNotNull)
    in.mapPartitions { rows =>
      rows.flatMap { r =>
        val aid = r.getLong(0)
        parseRecords(r.getAs[Array[Byte]](1)).iterator.zipWithIndex.map {
          case (rec, i) =>
            val wtype = rec.header("warc-type").orNull
            val http = httpSplit(rec.body)
            val ctype = http.flatMap(_._2)
              .orElse(rec.header("content-type")).map(_.takeWhile(_ != ';').trim)
            val isHtml = ctype.exists(_.equalsIgnoreCase("text/html"))
            val isText = ctype.exists(_.toLowerCase.startsWith("text/"))
            val bodyText: String = http match {
              case Some((_, _, payloadBytes)) if isHtml =>
                htmlToText(new String(payloadBytes, StandardCharsets.UTF_8))
              case Some((_, _, payloadBytes)) if isText =>
                new String(payloadBytes, StandardCharsets.UTF_8)
              case None if isHtml =>
                htmlToText(new String(rec.body, StandardCharsets.UTF_8))
              case None if isText && wtype != null && wtype != "request" =>
                new String(rec.body, StandardCharsets.UTF_8)
              case _ => null
            }
            Row(aid, i, wtype,
              rec.header("warc-target-uri").orNull,
              rec.header("warc-date").orNull,
              ctype.orNull,
              http.map(h => Integer.valueOf(h._1)).orNull,
              bodyText)
        }
      }
    }(enc)
  }
}
