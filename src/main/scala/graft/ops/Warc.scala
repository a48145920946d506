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
    // Initial capacity only (the stream grows): cap it — b.length * 4
    // overflows Int on ~512 MiB payloads, and ByteArrayOutputStream
    // throws on a negative capacity BEFORE the salvage try.
    val out = new ByteArrayOutputStream(
      math.max(64L, math.min(b.length.toLong * 4, 1L << 26)).toInt)
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
          // toLongOption alone admits a negative length, and
          // copyOfRange(from > to) then THROWS out of the salvage path.
          val len = hs.get("content-length").flatMap(_.toLongOption)
            .filter(n => n >= 0 && n <= Int.MaxValue)
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
  private val entity =
    "&(amp|lt|gt|quot|apos|nbsp|#x[0-9a-fA-F]{1,6}|#[0-9]{1,7});".r

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
    // ONE pass for named + numeric entities: chained global replaces
    // double-decode ("&amp;lt;" — an author literally writing "&lt;" —
    // must yield "&lt;", not "<"; each source position decodes at most
    // once).
    s = entity.replaceAllIn(s, m => {
      val rep = m.group(1) match {
        case "amp" => "&"
        case "lt" => "<"
        case "gt" => ">"
        case "quot" => "\""
        case "apos" => "'"
        case "nbsp" => " "
        case g =>
          val cp = if (g.charAt(1) == 'x' || g.charAt(1) == 'X')
            Integer.parseInt(g.substring(2), 16)
          else Integer.parseInt(g.substring(1))
          if (Character.isValidCodePoint(cp) && !(cp >= 0xD800 && cp <= 0xDFFF) &&
              (cp >= 0x20 || cp == '\n'.toInt || cp == '\t'.toInt))
            new String(Character.toChars(cp))
          else " "
      }
      java.util.regex.Matcher.quoteReplacement(rep)
    })
    s.split("\n").map(_.replaceAll("[ \\t\\x0B\\f\\r]+", " ").trim)
      .filter(_.nonEmpty).mkString("\n")
  }

  /** Synthetic per-row WARC archive (one gzip member, one 200 HTML
    * response wrapping `text`) — the bench/spec fixture builder, the
    * [[MediaCodecs.syntheticImageAssets]] discipline: build REAL archive
    * bytes once outside the timed thunk so the timed pass measures
    * gunzip + record framing + HTTP split + HTML extraction, not
    * fixture synthesis. Output: (asset_id, payload). */
  def syntheticArchives(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val in: Dataset[Row] = docs.select(id.cast("long").as("i"), text.as("t"))
      .where(col("i").isNotNull && col("t").isNotNull)
    in.mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        val html =
          (s"<html><head><title>doc $i</title></head><body><h1>Doc $i</h1>" +
            s"<p>${r.getString(1)}</p></body></html>").getBytes(StandardCharsets.UTF_8)
        val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
          s"Content-Length: ${html.length}\r\n\r\n").getBytes(StandardCharsets.US_ASCII) ++ html
        val warc = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
          s"WARC-Target-URI: http://example.com/doc/$i\r\n" +
          s"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: ${http.length}\r\n\r\n")
          .getBytes(StandardCharsets.US_ASCII) ++ http ++
          "\r\n\r\n".getBytes(StandardCharsets.US_ASCII)
        val bos = new ByteArrayOutputStream(warc.length / 2 + 64)
        val gz = new java.util.zip.GZIPOutputStream(bos)
        gz.write(warc); gz.finish()
        Row(i, bos.toByteArray)
      }
    }(enc)
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
