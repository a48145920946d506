package graft

import org.apache.spark.sql.functions._

import graft.ops.Warc

/** Diagnosis probe (not driver contract): where does `x_warc_ingest`'s
  * time actually go? The bench thunk is `Pipelines.warcDocuments` over
  * persisted synthetic archives — gunzip + WARC framing + HTTP split +
  * charset decode + HTML→text, one narrow mapPartitions. Round 12's
  * decode hardening (charset sniffing, coding lists, dual inflate)
  * tripped the 1.5× bench flag (0.29 s pin → 0.48–0.60 s), so this
  * probe times, warm (one untimed priming run, median of 5), each stage
  * cut as a mapPartitions count over the SAME persisted archives:
  *
  *  - gunzip:   member decompression alone
  *  - parse:    + WARC record framing (parseRecords)
  *  - http:     + HTTP split incl. TE/CE handling (httpParse)
  *  - decode:   + charset sniff + byte→String (decodeText)
  *  - html:     + HTML→text extraction (htmlToText)
  *  - records:  the full Warc.records operator (row assembly included)
  *  - full:     the bench thunk (Pipelines.warcDocuments + agg)
  *
  * Usage: runMain graft.WarcCostProbe [sfDir]
  */
object WarcCostProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Graft.session("graft-warccostprobe")
    import spark.implicits._
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    graft.sources.Catalog.register(spark, sf)
    val docs = spark.table("documents")
    val archives = Warc.syntheticArchives(docs, col("doc_id"), col("text"))
      .persist()
    println(s"archives: ${archives.count()}")
    val payloads = archives.select(col("payload")).as[Array[Byte]]

    def med(f: () => Unit): Double = {
      f()
      val xs = Seq.fill(5) {
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      xs.sorted.apply(2)
    }
    def p(name: String, sec: Double): Unit = println(f"== $name%-8s $sec%7.3f sec")

    def stage(f: Array[Byte] => Long): Unit = {
      val n = payloads.mapPartitions(_.map(f)).reduce(_ + _)
      require(n > 0, "stage produced nothing")
    }

    p("gunzip", med(() => stage(b => Warc.gunzip(b).length.toLong)))
    p("parse", med(() => stage(b => Warc.parseRecords(b).size.toLong)))
    p("http", med(() => stage { b =>
      Warc.parseRecords(b).iterator.map(r => Warc.httpParse(r.body) match {
        case Some(m) => m.body.length.toLong; case None => 0L
      }).sum
    }))
    p("decode", med(() => stage { b =>
      Warc.parseRecords(b).iterator.map { r =>
        Warc.httpParse(r.body) match {
          case Some(m) if m.decoded =>
            Warc.decodeText(m.body, m.header("content-type")).length.toLong
          case _ => 0L
        }
      }.sum
    }))
    p("html", med(() => stage { b =>
      Warc.parseRecords(b).iterator.map { r =>
        Warc.httpParse(r.body) match {
          case Some(m) if m.decoded =>
            Warc.htmlToText(Warc.decodeText(m.body, m.header("content-type")))
              .length.toLong
          case _ => 0L
        }
      }.sum
    }))
    p("records", med(() => {
      Warc.records(archives, col("asset_id"), col("payload"))
        .agg(count(lit(1))).head(); ()
    }))
    p("full", med(() => {
      graft.api.Pipelines.warcDocuments(archives, col("asset_id"), col("payload"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("c")).head(); ()
    }))

    // Single-threaded driver-side stage costs over the same payloads —
    // Spark task overhead and ambient load swamp per-record deltas at
    // 5k records, so the CPU story comes from here (bench fixture only;
    // fine to collect).
    val local = payloads.collect()
    def lmed(f: () => Long): Double = {
      f()
      val xs = Seq.fill(5) {
        val t0 = System.nanoTime()
        val n = f()
        require(n >= 0)
        (System.nanoTime() - t0) / 1e9
      }
      xs.sorted.apply(2)
    }
    def lp(name: String, sec: Double): Unit =
      println(f"-- local $name%-8s $sec%7.3f sec")
    lp("gunzip", lmed(() => local.iterator.map(b => Warc.gunzip(b).length.toLong).sum))
    lp("parse", lmed(() => local.iterator.map(b => Warc.parseRecords(b).size.toLong).sum))
    lp("http", lmed(() => local.iterator.map { b =>
      Warc.parseRecords(b).iterator.map(r => Warc.httpParse(r.body)
        .map(_.body.length.toLong).getOrElse(0L)).sum
    }.sum))
    lp("decode", lmed(() => local.iterator.map { b =>
      Warc.parseRecords(b).iterator.map { r =>
        Warc.httpParse(r.body) match {
          case Some(m) if m.decoded =>
            Warc.decodeText(m.body, m.header("content-type")).length.toLong
          case _ => 0L
        }
      }.sum
    }.sum))
    lp("html", lmed(() => local.iterator.map { b =>
      Warc.parseRecords(b).iterator.map { r =>
        Warc.httpParse(r.body) match {
          case Some(m) if m.decoded =>
            Warc.htmlToText(Warc.decodeText(m.body, m.header("content-type")))
              .length.toLong
          case _ => 0L
        }
      }.sum
    }.sum))

    // htmlToText pass-by-pass: which of the regex passes carries the cost?
    val htmls: Array[String] = local.iterator.flatMap { b =>
      Warc.parseRecords(b).iterator.flatMap { r =>
        Warc.httpParse(r.body) match {
          case Some(m) if m.decoded =>
            Iterator.single(Warc.decodeText(m.body, m.header("content-type")))
          case _ => Iterator.empty
        }
      }
    }.toArray
    println(s"htmls: ${htmls.length}, chars: ${htmls.iterator.map(_.length.toLong).sum}")
    for ((name, f) <- Warc.textPasses)
      lp(name, lmed(() => htmls.iterator.map(h => f(h).length.toLong).sum))
    spark.stop()
  }
}
