package graft

import org.apache.spark.sql.functions._

/** Stage decomposition of the x_warc_links bench extra (the AnnCostProbe
  * discipline): archives → href extraction + resolution (Warc.links) →
  * canonical host projection → the weighted-edge agg. Each stage cut at
  * an action; median of 3 after a warm pass. */
object LinkCostProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Graft.session("graft-linkcostprobe")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    graft.sources.Catalog.register(spark, sf)
    val docs = spark.table("documents")
    val linky = docs.select(col("doc_id"), concat(
      col("text"),
      lit("<a href=\"https://hub.example.org/x?a=1&amp;b=2\">h</a>"),
      lit("<a href='/rel/"), (col("doc_id") % 97).cast("string"), lit("'>r</a>"),
      lit("<a href=\"http://site"), (col("doc_id") % 1000).cast("string"),
      lit(".org/p\">s</a>")).as("text"))
    val archives = graft.ops.Warc.syntheticArchives(
      linky, col("doc_id"), col("text")).persist()
    println(s"== archives ${archives.count()}")

    def med(f: () => Unit): Double = {
      f()
      val xs = Seq.fill(3) {
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      xs.sorted.apply(1)
    }
    def p(name: String, sec: Double): Unit = println(f"== $name%-12s $sec%7.3f sec")

    val links = graft.ops.Warc.links(archives, col("asset_id"), col("payload"))
    p("links", med(() => { links.agg(count(lit(1))).head(); () }))
    p("links+canon", med(() => {
      links.select(
          graft.ops.TextOps.canonicalizeUrl(col("src_url")).as("s"),
          graft.ops.TextOps.canonicalizeUrl(col("dst_url")).as("d"))
        .agg(count(lit(1))).head(); () }))
    p("hostproj", med(() => {
      graft.api.Pipelines.linkGraph(links, col("src_url"), col("dst_url"))
        .agg(count(lit(1)).as("edges"), sum("weight").as("links")).head(); () }))
    // Extraction-only twin (no URI resolution): how much is the regex scan?
    val extractOnly = archives.mapPartitions { rows =>
      rows.map { r =>
        val recs = graft.ops.Warc.parseRecords(r.getAs[Array[Byte]](1))
        recs.map { rec =>
          graft.ops.Warc.httpParse(rec.body) match {
            case Some(m) if m.decoded =>
              graft.ops.Warc.extractHrefs(new String(m.body,
                java.nio.charset.StandardCharsets.UTF_8)).size
            case _ => 0
          }
        }.sum
      }
    }(org.apache.spark.sql.Encoders.scalaInt)
    p("extract-only", med(() => { extractOnly.agg(sum(col("value"))).head(); () }))
    spark.stop()
  }
}
