package graft.streaming

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The streaming crawl→authority composition: a WARC archive stream
  * folded batch-by-batch into maintained host PageRank must land on the
  * same fixpoint as the batch pipeline over the union of all archives
  * (±1 micro-unit quantization plateau), with no streaming state
  * operators anywhere (the fold state lives in VersionedState, not the
  * stream). */
class StreamLinkSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def crlf(lines: String*): Array[Byte] =
    lines.mkString("", "\r\n", "\r\n").getBytes(StandardCharsets.UTF_8)

  private def archive(id: Long, uri: String, hrefs: Seq[String]): StreamAsset = {
    val html = hrefs.map(h => s"""<a href="$h">l</a>""").mkString(
      "<html><body>", "", "</body></html>")
    val p = html.getBytes(StandardCharsets.UTF_8)
    val http = crlf("HTTP/1.1 200 OK", "Content-Type: text/html; charset=utf-8",
      s"Content-Length: ${p.length}", "") ++ p
    val rec = crlf("WARC/1.0", "WARC-Type: response", s"WARC-Target-URI: $uri",
      "WARC-Date: 2024-01-02T03:04:05Z", s"Content-Length: ${http.length}",
      "") ++ http ++ "\r\n\r\n".getBytes(StandardCharsets.US_ASCII)
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos); gz.write(rec); gz.finish()
    StreamAsset(id, bos.toByteArray)
  }

  // A 4-host graph crawled over three batches; one relative href per
  // page pins end-to-end resolution (it resolves to the page's own host
  // and must drop as a self-loop).
  private val batches: Seq[Seq[StreamAsset]] = Seq(
    Seq(archive(1L, "http://a.org/p", Seq("https://hub.org/x", "http://b.org/p", "/self")),
      archive(2L, "http://b.org/p", Seq("https://hub.org/y"))),
    Seq(archive(3L, "http://c.org/p", Seq("https://HUB.org:443/z", "http://a.org/p"))),
    Seq(archive(4L, "http://hub.org/p", Seq("http://a.org/q", "#frag"))))

  private def ranks(d: DataFrame): Map[String, Long] =
    d.select("node", "r").collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def within1(a: Map[String, Long], b: Map[String, Long]): Boolean =
    a.keySet == b.keySet && a.forall { case (k, v) => math.abs(v - b(k)) <= 1L }

  test("streamHostAuthority: maintained ranks land on the batch pipeline's fixpoint") {
    val root = Files.createTempDirectory("graft-streamlink").toString
    val (state, edges, out, ckpt) =
      (s"$root/state", s"$root/edges", s"$root/out", s"$root/ckpt")
    val mem = MemoryStream[StreamAsset]
    // damping 0.5 + 30 rounds/batch: the integer fixpoint is reachable
    // inside the test budget (the RankLoopSpec discipline), so the final
    // batch's warm fold sits ON the fixpoint, not merely near it.
    val q = graft.api.Pipelines.streamHostAuthority(
      mem.toDF(), col("asset_id"), col("payload"),
      iterations = 30, state, edges, out, ckpt, damping = 0.5)
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      val plan = q.lastProgress
      assert(plan == null || plan.stateOperators.isEmpty,
        "the crawl fold must not create streaming state")
    } finally q.stop()

    val maintained = ranks(RankLoop.latestRanks(spark, state))
    // Batch twin over the union of all archives.
    val all = batches.flatten.toDF()
    val batchRanks = ranks(graft.ops.GraphOps.pageRank(
      graft.api.Pipelines.linkGraph(
        graft.ops.Warc.links(all, col("asset_id"), col("payload")),
        col("src_url"), col("dst_url")),
      iterations = 40, damping = 0.5))
    assert(within1(maintained, batchRanks),
      s"stream $maintained vs batch $batchRanks")
    // The graph the stream built: case/port variants of hub folded, the
    // relative self link dropped, and hub out-ranks everyone.
    assert(maintained.keySet == Set("a.org", "b.org", "c.org", "hub.org"))
    assert(maintained.maxBy(_._2)._1 == "hub.org")
  }
}
