package graft.webtext

import graft.lexical.Tokenset
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic Common-Crawl-style webtext corpus with the
  * input-contract schema `(url STRING, warc_ts TIMESTAMP, html BINARY,
  * text STRING, lang STRING)` (BASELINE.json input_hint; FIXTURES.md §1).
  *
  * All content is a pure function of the row id (hash-derived, seed 42): the
  * generator yields byte-identical html/text per url at any parallelism.
  * Pages embed 1-5 mention phrases drawn Zipf-style from a concept label
  * pool, so head concepts create the skew the pipeline must handle.
  */
object WebtextGen {

  val Vocab: Vector[String] = Vector(
    "table", "row", "column", "vector", "hash", "key", "value", "line",
    "scan", "join", "sort", "filter", "agg", "merge", "group", "order",
    "window", "query", "batch", "stream", "data", "spark", "part", "customer",
    "small", "big", "fast", "slow")

  /** Mention pool: "modifier head" bigrams over the vocabulary; index
    * selection is Zipf-ish (hash mod skew) to create head concepts. */
  val MentionPool: Vector[String] = {
    val heads = Vector("join", "scan", "sort", "merge", "agg", "window", "filter", "group")
    val mods = Vector("hash", "sort", "fast", "big", "small", "batch", "stream", "vector")
    for (m <- mods; h <- heads) yield s"$m $h"
  }

  private def pick[A](pool: Vector[A], h: Long, salt: Int): A = {
    // Zipf-ish skew: square the uniform draw so low indices dominate
    val u = (java.lang.Long.remainderUnsigned(Tokenset.fnv1a64(s"$h:$salt"), 10000L)).toDouble / 10000.0
    pool(((u * u) * pool.size).toInt.min(pool.size - 1))
  }

  /** Driver-independent row content as a pure function of the row index. */
  def pageFor(i: Long): (String, java.sql.Timestamp, Array[Byte], String, String) = {
    val h = Tokenset.fnv1a64(s"page:$i")
    val url = s"https://host${java.lang.Long.remainderUnsigned(h, 97L)}.example/doc/$i"
    val ts = new java.sql.Timestamp(1700000000000L + (java.lang.Long.remainderUnsigned(h, 86400L * 30) * 1000L))
    val lang = java.lang.Long.remainderUnsigned(h, 20L) match {
      case 17 => "de"; case 18 => "fr"; case 19 => "zh"; case _ => "en"
    }
    val nWords = 30 + java.lang.Long.remainderUnsigned(h, 90L).toInt
    val words = (0 until nWords).map(j => pick(Vocab, h, j))
    val nMentions = 1 + java.lang.Long.remainderUnsigned(h >> 7, 5L).toInt
    val mentions = (0 until nMentions).map(j => pick(MentionPool, h, 1000 + j))
    val body = (words.take(nWords / 2) ++ mentions ++ words.drop(nWords / 2)).mkString(" ")
    val title = mentions.head
    val html = s"""<html><head><title>$title</title><style>p{margin:0}</style>
                  |<script>var x=$i;</script></head>
                  |<body><!-- page $i --><h1>$title</h1><p>$body</p>&amp;</body></html>""".stripMargin
    val text = graft.extract.HtmlExtract.extractLocal(html)
    (url, ts, html.getBytes("UTF-8"), text, lang)
  }

  /** Distributed generation: `n` pages, content derived per row id only. */
  def generate(spark: SparkSession, n: Long, partitions: Int = 32): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).as[Long]
      .map(pageFor _)
      .toDF("url", "warc_ts", "html", "text", "lang")
  }
}
