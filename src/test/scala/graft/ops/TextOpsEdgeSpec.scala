package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Boundary behavior of the text column builders on degenerate inputs
  * (empty docs, single tokens, docs shorter than the shingle width). */
class TextOpsEdgeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def df(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("langClassify: per-language LM argmax separates held-out corpora") {
    import spark.implicits._
    val docs = graft.TestSpark.table("documents").select("doc_id", "text")
    // Two "languages": fixture English-ish vs md5-hex gibberish. Train
    // on one half, classify the held-out other half.
    def hexDocs(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(col("id").as("doc_id"),
        concat_ws(" ", md5(col("id").cast("string")),
          md5((col("id") + 3).cast("string")),
          md5((col("id") + 9).cast("string"))).as("text"))
    val models = Map(
      "en" -> graft.ops.TextOps.ngramModelBytes(
        graft.ops.TextOps.ngramModel(docs.where(col("doc_id") % 2 === 0), col("text"))),
      "hx" -> graft.ops.TextOps.ngramModelBytes(
        graft.ops.TextOps.ngramModel(hexDocs(0, 100), col("text"))))
    val cls = graft.ops.TextOps.langClassify(col("text"), models)
    val enHeld = docs.where(col("doc_id") % 2 === 1)
      .select(cls.as("l")).groupBy("l").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(enHeld.getOrElse("en", 0L) > 9 * enHeld.getOrElse("hx", 0L),
      s"held-out English must classify en overwhelmingly: $enHeld")
    val hxHeld = hexDocs(100, 150).select(cls.as("l")).groupBy("l").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hxHeld.getOrElse("hx", 0L) == 50L,
      s"held-out gibberish must classify hx: $hxHeld")
    // Degenerate text: NULL class, and one-model maps work.
    val deg = Seq((1L, "ab"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    assert(deg.select(cls.as("l")).collect().forall(_.isNullAt(0)))
    assert(deg.select(graft.ops.TextOps.langClassify(col("text"),
      models.view.filterKeys(_ == "en").toMap).as("l")).collect().forall(_.isNullAt(0)))
    intercept[IllegalArgumentException] {
      graft.ops.TextOps.langClassify(col("text"), Map.empty)
    }
  }

  test("langClassify: fused expression ≡ composed greatest-of-lm_score lowering") {
    import spark.implicits._
    val docs = graft.TestSpark.table("documents").select("doc_id", "text")
      .where(col("doc_id") < 200)
    def slice(m: Int) = docs.where(col("doc_id") % 4 === m)
    // Four models over disjoint corpus slices (near-identical
    // distributions — the adversarial case for tie/ordering parity), one
    // of them at a DIFFERENT gram width so the per-width walk is
    // exercised, plus degenerate rows.
    val models = (0 until 3).map { m =>
      s"l$m" -> graft.ops.TextOps.ngramModelBytes(
        graft.ops.TextOps.ngramModel(slice(m), col("text")))
    }.toMap + ("w2" -> graft.ops.TextOps.ngramModelBytes(
      graft.ops.TextOps.ngramModel(slice(3), col("text"), n = 2), n = 2))
    val probe = docs.unionByName(
      Seq((9001L, "ab"), (9002L, "x"), (9003L, ""),
          (9004L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val both = probe.select(col("doc_id"),
        graft.ops.TextOps.langClassify(col("text"), models).as("fused"),
        graft.ops.TextOps.langClassifyComposed(col("text"), models).as("composed"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getAs[String]("fused") == r.getAs[String]("composed"),
        s"doc ${r.getLong(0)}: fused ${r.getAs[String]("fused")} != " +
          s"composed ${r.getAs[String]("composed")}")
    }
    // "ab" (2 code points) scores under the width-2 model ONLY — it must
    // classify, not NULL (the per-width gate is per model, not global).
    val ab = both.find(_.getLong(0) == 9001L).get
    assert(ab.getAs[String]("fused") == "w2")
    // Exact tie: the same model bytes under two lang names — the
    // UTF8-binary-larger name wins (greatest struct ordering).
    val tied = Map("aa" -> models("l0"), "ab" -> models("l0"))
    val t = docs.limit(20).select(
        graft.ops.TextOps.langClassify(col("text"), tied).as("f"),
        graft.ops.TextOps.langClassifyComposed(col("text"), tied).as("c"))
      .collect()
    t.foreach { r =>
      assert(r.getString(0) == "ab" && r.getString(1) == "ab") }
  }

  test("redactPii: classes hit, order is canonical, degenerate inputs safe") {
    import spark.implicits._
    val d = Seq(
      (0L, "mail me at alice.smith+x@sub.example.co.uk today"),
      (1L, "server 10.0.255.3 and backup 192.168.1.1"),
      (2L, "call +1-555-123-4567 or 555.987.6543"),
      (3L, "mixed: bob@x.io at 8.8.8.8 tel 555-000-1111 order 1234567"),
      (4L, ""),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val r = d.select(col("doc_id"),
        graft.ops.TextOps.redactPii(col("text")).as("red"),
        graft.ops.TextOps.redactPii(col("text"),
          Seq("email", "ipv4", "phone", "number")).as("redAll"))
      .collect().map(x => x.getLong(0) -> (x.getString(1), x.getString(2))).toMap
    assert(r(0)._1 == "mail me at <EMAIL> today")
    assert(r(1)._1 == "server <IP> and backup <IP>")
    assert(r(2)._1 == "call <PHONE> or <PHONE>")
    // Canonical order: the email's digits and the IP's octets are NOT
    // shredded by the phone/number classes; leftover digit runs only
    // fall to <NUM> when that class is requested.
    assert(r(3)._1 == "mixed: <EMAIL> at <IP> tel <PHONE> order 1234567")
    assert(r(3)._2 == "mixed: <EMAIL> at <IP> tel <PHONE> order <NUM>")
    assert(r(4)._1 == "")
    assert(r(5)._1 == null)
    intercept[IllegalArgumentException] {
      graft.ops.TextOps.redactPii(col("text"), Seq("ssn"))
    }
    intercept[IllegalArgumentException] {
      graft.ops.TextOps.redactPii(col("text"), Nil)
    }
  }

  test("tokens/shingles on degenerate inputs never error and stay non-empty") {
    val d = df("", "one", "two words", "a b c d")
    val r = d.select(
      size(TextOps.tokens(col("text"))).as("nt"),
      size(TextOps.wordShingles(col("text"), 3)).as("ws"),
      size(TextOps.charShingles(col("text"), 3)).as("cs")).collect()
    // split("") -> [""]; shingle builders clamp to >= 1 shingle.
    assert(r.forall(_.getInt(0) >= 1))
    assert(r.forall(_.getInt(1) >= 1))
    assert(r.forall(_.getInt(2) >= 1))
    // "a b c d" -> 2 word-3-shingles ("a b c", "b c d")
    assert(r(3).getInt(1) == 2)
  }

  test("quality/langid math never divides to NaN/null on degenerate docs") {
    val d = df("", "the", "zz")
    val r = d.select(
      TextOps.stopwordRatio(col("text")).as("sr"),
      TextOps.typeTokenRatio(col("text")).as("ttr"),
      TextOps.qualityVerdict(col("text")).as("v")).collect()
    assert(r.forall(x => !x.isNullAt(0) && !x.getDouble(0).isNaN))
    assert(r.forall(x => !x.isNullAt(1) && !x.getDouble(1).isNaN))
    assert(r.forall(x => Seq("keep", "drop").contains(x.getString(2))))
    assert(r(1).getDouble(0) == 1.0) // "the" is all stopwords
  }

  test("char-shingle near-dup never pairs null-text docs (NULL shingles don't equi-join)") {
    import spark.implicits._
    // The declared q57 SQL produces NULL shingles for null text (bare
    // substr), and NULL never matches in the inverted-index join — so two
    // null docs, or a null and an empty doc, must NOT come out as a
    // Jaccard-1.0 pair. Coalescing char shingles to '' would pair them.
    val docs = Seq((1L, null: String), (2L, null: String), (3L, ""),
      (4L, "abcabc"), (5L, "abcabc"))
      .toDF("doc_id", "text")
    val pairs = DedupOps.pairwiseJaccard(
        DedupOps.charShingleSet(docs, col("doc_id"), col("text"), 3), "sh", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((4L, 5L)), s"unexpected pairs: $pairs")
  }

  test("fingerprints differ across different docs, agree across identical text") {
    val d = df("same text here", "same text here", "different entirely")
    val fps = d.select(TextOps.docFingerprint(col("text")).as("fp")).collect().map(_.getString(0))
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("ngram LM: in-distribution text outscores gibberish; probabilities and OOV sane") {
    val docs = graft.TestSpark.table("documents")
    val model = TextOps.ngramModel(docs, col("text"), n = 3).cache()
    // A proper distribution over the kept vocabulary: probabilities sum
    // to <= 1 (strictly < 1 exactly when minCount trimmed a tail).
    val pSum = model.agg(sum(exp(col("logp")))).head().getDouble(0)
    assert(pSum > 0.5 && pSum <= 1.0 + 1e-9, s"sum p = $pSum")
    // Score a real corpus document against md5-hex gibberish (charset
    // alone overlaps; the trigram DISTRIBUTION does not).
    val spark2 = spark
    import spark2.implicits._
    val realText = docs.orderBy("doc_id").select("text").head().getString(0)
    val junk = (1 to 20).map(i =>
      graft.verify.Canon.hashOf(docs.limit(i))._1).mkString(" ")
    val probe = Seq((1L, realText), (2L, junk)).toDF("doc_id", "text")
    val scored = TextOps.ngramScore(probe, col("doc_id"), col("text"), model)
      .orderBy("doc_id").collect()
    val (realScore, junkScore) = (scored(0).getDouble(1), scored(1).getDouble(1))
    assert(realScore > junkScore,
      s"LM failed to separate: real $realScore vs junk $junkScore")
    // OOV: the real doc's grams are all in-model (it trained on them);
    // gibberish has a high OOV rate, and rates stay within [0, 1].
    val (realOov, junkOov) = (scored(0).getDouble(2), scored(1).getDouble(2))
    assert(realOov >= 0 && realOov <= 1 && junkOov > realOov)
    // Degenerate rows: null text row-absent, sub-gram text scores too
    // (charShingles pads short docs with one short gram, filtered here —
    // a 2-char doc has no trigram evidence, so it is row-absent).
    val edge = Seq((1L, Option("ab")), (2L, None: Option[String]))
      .toDF("doc_id", "text")
    assert(TextOps.ngramScore(edge, col("doc_id"), col("text"), model).count() == 0)
  }

  test("canonicalizeUrl: folds crawl variants, keeps real distinctions") {
    import spark.implicits._
    def canon(urls: String*): Seq[Option[String]] =
      urls.toDF("u").select(TextOps.canonicalizeUrl(col("u")).as("c"))
        .collect().toSeq.map(r => Option(r.getString(0)))
    // The five-way q178 variant family: case/default-port/fragment/
    // tracking fold together; scheme and non-default port do not.
    assert(canon(
      "https://H3.Example.COM:443/Dir/9?b=2&a=1",
      "HTTPS://h3.example.com/Dir/9?a=1&b=2&utm_campaign=spring#sec2",
      "https://h3.EXAMPLE.com/Dir/9?utm_source=feed&b=2&fbclid=XyZ&a=1")
      .distinct == Seq(Some("https://h3.example.com/Dir/9?a=1&b=2")))
    assert(canon("http://h3.example.com:80/Dir/9?a=1&b=2")
      == Seq(Some("http://h3.example.com/Dir/9?a=1&b=2")))
    assert(canon("https://h3.example.com:8443/Dir/9?a=1&b=2")
      == Seq(Some("https://h3.example.com:8443/Dir/9?a=1&b=2")))
    // Degenerate shapes: bare host → '/', '?'-only and all-tracking
    // queries dropped, '&&' empties dropped, path case preserved,
    // http's default port is NOT https's.
    assert(canon("HTTP://Host.ORG") == Seq(Some("http://host.org/")))
    assert(canon("https://h.org/p?") == Seq(Some("https://h.org/p")))
    assert(canon("https://h.org/p?utm_source=x&gclid=1")
      == Seq(Some("https://h.org/p")))
    assert(canon("https://h.org/A/B?b=2&&a=1")
      == Seq(Some("https://h.org/A/B?a=1&b=2")))
    assert(canon("http://h.org:443/p") == Seq(Some("http://h.org:443/p")))
    // Bare tracking name without '=' is still dropped; a param merely
    // PREFIXED by a tracking name is kept.
    assert(canon("https://h.org/p?gclid&a=1") == Seq(Some("https://h.org/p?a=1")))
    assert(canon("https://h.org/p?gclid_like=1")
      == Seq(Some("https://h.org/p?gclid_like=1")))
    // No scheme://-shaped head → NULL (row-degrade, never throw).
    assert(canon("not a url", "://missing/x", "mailto:a@b")
      == Seq(None, None, None))
    // Custom tracking set.
    val custom = Seq("https://h.org/p?sid=9&a=1").toDF("u")
      .select(TextOps.canonicalizeUrl(col("u"), trackingParams = "sid").as("c"))
      .head().getString(0)
    assert(custom == "https://h.org/p?a=1")
  }

  test("registeredDomain: PSL-lite apex folding, degrades honestly") {
    import spark.implicits._
    def apex(hosts: String*): Seq[Option[String]] =
      hosts.toDF("h").select(TextOps.registeredDomain(col("h")).as("a"))
        .collect().toSeq.map(r => Option(r.getString(0)))
    // Multi-part public suffixes take three labels; plain TLDs take two.
    assert(apex("news.bbc.co.uk", "www.bbc.co.uk", "bbc.co.uk")
      == Seq(Some("bbc.co.uk"), Some("bbc.co.uk"), Some("bbc.co.uk")))
    assert(apex("a.b.example.com", "example.com", "sub.shop.com.au")
      == Seq(Some("example.com"), Some("example.com"), Some("shop.com.au")))
    // Case folds; a bare suffix or single label returns itself; NULL rides.
    assert(apex("News.BBC.CO.UK") == Seq(Some("bbc.co.uk")))
    assert(apex("co.uk", "localhost") == Seq(Some("co.uk"), Some("localhost")))
    assert(Seq(Option.empty[String]).toDF("h")
      .select(TextOps.registeredDomain(col("h")).as("a")).head().isNullAt(0))
    // Caller-supplied extra suffixes extend the list.
    val extra = Seq("x.blogspot.co.uk").toDF("h")
      .select(TextOps.registeredDomain(col("h"),
        extra = Seq("blogspot.co.uk")).as("a")).head().getString(0)
    assert(extra == "x.blogspot.co.uk")
  }

  test("c4CleanLines/c4PageKeep: the published line and page gates, edge cases") {
    import spark.implicits._
    def clean(t: String): String =
      Seq(t).toDF("t").select(TextOps.c4CleanLines(col("t")).as("c"))
        .head().getString(0)
    // Line gates: terminal punct, >=3 words, the javascript WORD (not
    // prefix), trim-before-test; kept lines come back trimmed.
    assert(clean(Seq(
      "A real sentence ends here.",
      "Home | About | Contact",          // no terminal punct
      "ok.",                             // < 3 words
      "Menus need javascript here.",     // the word drops the line
      "JavascriptX is a product name.",  // boundary: NOT the word
      "  Padded line survives trim.  ",
      "Ends with a question?",
      "Ends with a quote.\"").mkString("\n")) == Seq(
      "A real sentence ends here.",
      "JavascriptX is a product name.",
      "Padded line survives trim.",
      "Ends with a question?",
      "Ends with a quote.\"").mkString("\n"))
    // Degenerate shapes: empty text and all-dropped pages yield ''.
    assert(clean("") == "")
    assert(clean("no punct at all\nshort.") == "")
    // Page gates: sentence floor on the CLEANED text, lorem/brace on RAW.
    def keep(cleaned: String, raw: String, minS: Int = 2): Boolean =
      Seq((cleaned, raw)).toDF("c", "r")
        .select(TextOps.c4PageKeep(col("c"), col("r"), minS).as("k"))
        .head().getBoolean(0)
    assert(keep("One. Two.", "One. Two."))
    assert(!keep("One.", "One."), "below the sentence floor")
    assert(!keep("One. Two.", "One. Two. Lorem IPSUM follows"),
      "lorem ipsum is case-insensitive and tested on the raw page")
    assert(!keep("One. Two.", "One. Two. {code}"), "brace kills the page")
    // The raw-column discipline matters: cleaning can delete the brace
    // line, but the page must still die.
    val df = Seq((1L, "Good sentence stays here.\nvar x = {json}")).toDF("doc_id", "text")
    assert(graft.api.Pipelines.c4Filter(df, col("doc_id"), col("text"),
      minSentences = 1).count() == 0)
    // And a surviving page comes back cleaned with its sentence count.
    val ok = Seq((2L, "First real sentence here.\nnav | bar\nSecond one lands too."))
      .toDF("doc_id", "text")
    val out = graft.api.Pipelines.c4Filter(ok, col("doc_id"), col("text"),
      minSentences = 2).head()
    assert(out.getString(1) == "First real sentence here.\nSecond one lands too." &&
      out.getInt(2) == 2)
  }
}
