package graft

import graft.extract.HtmlExtract
import graft.webtext.WebtextGen
import org.apache.spark.sql.functions._

/** HTML-extraction goldens: byte-identical text per url across runs and
  * parallelism levels (the input-contract invariant), plus hand-built edge
  * cases (FIXTURES.md §6). */
class ExtractSpec extends SparkSpecBase {

  val cases: Seq[(String, String)] = Seq(
    ("<html><body>Hello <b>World</b></body></html>", "Hello World"),
    ("<p>a</p><script>var x = '<evil>';</script><p>b</p>", "a b"),
    ("<style>p { color: red; }</style>text", "text"),
    ("<!-- comment --><div>keep</div>", "keep"),
    ("a&amp;b &lt;tag&gt; &quot;q&quot; &#39;s&#39;", "a&b <tag> \"q\" 's'"),
    ("multi   \n\t  space", "multi space"),
    ("&nbsp;lead trail&nbsp;", "lead trail"),
    ("<HTML><BODY ATTR=\"x\">CAPS</BODY></HTML>", "CAPS"),
    ("unterminated <tag", "unterminated <tag"), // no closing '>' — not a tag
    ("UTF-8 éü中文 ok", "UTF-8 éü中文 ok"),
    ("numeric &#65; entity", "numeric entity"),
    ("<script>nested <script>x</script></script>after", "after"))

  test("extractLocal handles the golden cases") {
    for ((html, want) <- cases)
      assert(HtmlExtract.extractLocal(html) == want, s"case: $html")
  }

  test("column pipeline agrees with extractLocal byte-for-byte") {
    import spark.implicits._
    val df = cases.map(_._1).toDF("html")
    val got = df.select(HtmlExtract.extract(col("html")).as("t")).as[String].collect()
    for (((html, _), g) <- cases.zip(got))
      assert(g == HtmlExtract.extractLocal(html), s"column/local diverge on: $html")
  }

  test("webtext generation is byte-identical across parallelism levels") {
    import spark.implicits._
    val a = WebtextGen.generate(spark, 200, 1)
      .select("url", "text").as[(String, String)].collect().sortBy(_._1)
    val b = WebtextGen.generate(spark, 200, 7)
      .select("url", "text").as[(String, String)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    assert(a.map(_._1).distinct.length == 200) // urls unique
  }

  test("fused html->mentions equals extract-then-bigram composition") {
    import spark.implicits._
    val web = WebtextGen.generate(spark, 200, 4)
    val fused = graft.pipeline.KgPipeline
      .extractMentionsFromHtml(web.selectExpr("url", "html"), "html", 1L)
      .as[(String, Long)].collect().toMap
    val composed = graft.pipeline.KgPipeline
      .extractMentions(web.select(HtmlExtract.extractBinary(col("html")).as("text")), "text", 1L)
      .as[(String, Long)].collect().toMap
    assert(fused == composed)
  }

  test("scanner tokenization matches the column twin on non-ASCII text") {
    import spark.implicits._
    // the column twin lowers the WHOLE string (full case mapping: U+0130
    // 'İ' expands to 'i' + combining dot, a token boundary); per-char
    // Character.toLowerCase kept "İstanbul" one token — the column form
    // is the arbiter of the contract
    val samples = Seq(
      "İstanbul ÜRÜN ağaç table chair data",
      "ΑΣ σ table chair İ9 k9 data set",
      "crème BRÛLÉE data set vector table",
      "İİ Kİ data set table İ chair")
    val colForm = samples.toDF("text")
      .select(graft.pipeline.KgPipeline.mentionBigrams($"text").as("m"))
      .as[Seq[String]].collect()
    for ((s, expect) <- samples.zip(colForm)) {
      val fused = graft.extract.MentionScanner.mentionsFromText(s).toSeq
      assert(fused == expect, s"input '$s': fused=$fused column=$expect")
    }
  }

  test("intra-document state cap: a pathological page spills mid-document, counts stay exact") {
    import spark.implicits._
    import graft.extract.MentionScanner
    // ONE document with ~6k distinct bigrams against a 512-entry cap: the
    // between-documents check alone never fires (round-3 gap) — the spill
    // must trigger inside the document and the merged partials must equal
    // the uncapped counts
    val words = (0 until 6000).map(i => s"tok$i")
    val html = s"<html><body>${words.mkString(" ")} ${words.take(100).mkString(" ")}</body></html>"
    val state = new MentionScanner.MentionCounts()
    var spills = 0
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val spilled = MentionScanner.countMentionsInto(html, state, 512,
      it => { spills += 1; rows ++= it; assert(state.bigrams.size <= 512 + 64) })
    assert(spilled && spills >= 10, s"spills=$spills")
    assert(state.bigrams.size < 512 + 64, "counter exceeded the cap after final doc")
    val merged = (rows ++ state.iterator).groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toMap
    val uncapped = {
      val s = new MentionScanner.MentionCounts()
      MentionScanner.countMentionsInto(html, s)
      s.iterator.toMap
    }
    assert(merged == uncapped)
    // engine surface: capped distributed extraction equals the relational plan
    val df = Seq(html).toDF("html")
    val capped = graft.pipeline.KgPipeline
      .extractMentionsFromHtml(df, "html", 1L, maxStateEntries = 512)
      .as[(String, Long)].collect().toMap
    val relational = graft.pipeline.KgPipeline
      .extractMentions(df.select(HtmlExtract.extract(col("html")).as("text")), "text", 1L)
      .as[(String, Long)].collect().toMap
    assert(capped == relational)
  }

  test("intra-document cap bounds the token DICT too (stopword-adjacent pathological doc)") {
    import graft.extract.MentionScanner
    // every bigram contains "the" ⇒ zero counter entries, but each xN is a
    // distinct token — without the dict-side check the intern table grows
    // with document length unchecked
    val words = (0 until 4000).flatMap(i => Seq("the", s"x$i"))
    val html = s"<p>${words.mkString(" ")}</p>"
    val state = new MentionScanner.MentionCounts()
    var spills = 0
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    MentionScanner.countMentionsInto(html, state, 512,
      it => { spills += 1; rows ++= it; assert(state.dict.size <= 512 + 64) })
    assert(spills >= 7, s"spills=$spills")
    assert(state.dict.size < 512 + 64)
    assert((rows ++ state.iterator).isEmpty) // no valid bigrams in this doc
  }

  test("extracted text equals the generator's golden text column") {
    import spark.implicits._
    val web = WebtextGen.generate(spark, 100, 4)
    val mismatches = web
      .select(HtmlExtract.extractBinary(col("html")).as("got"), col("text"))
      .filter(col("got") =!= col("text")).count()
    assert(mismatches == 0)
  }
}
