package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic HTML → text extraction (SURVEY.md L7 — not in the
  * reference; required by the input contract: byte-identical extracted text
  * per url across runs and parallelism levels).
  *
  * Pure column-expression pipeline (codegen'd, order-free, no UDF):
  *   1. drop <script>/<style>/<!-- --> blocks
  *   2. strip tags, turning block-level boundaries into spaces
  *   3. decode the common HTML entities (incl. numeric)
  *   4. canonicalize whitespace runs, trim
  * Identical input bytes ⇒ identical output bytes, independent of
  * partitioning, because every step is a per-row pure function.
  */
object HtmlExtract {

  def extract(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<(script|style)[^>]*>.*?</\\1>", " ")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    val entities = Seq(
      "&nbsp;" -> " ", "&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'")
    val decoded = entities.foldLeft(noTags) { case (c, (from, to)) =>
      regexp_replace(c, java.util.regex.Pattern.quote(from), java.util.regex.Matcher.quoteReplacement(to))
    }
    val numeric = regexp_replace(decoded, "&#(\\d+);", " ")
    trim(regexp_replace(numeric, "\\s+", " "))
  }

  /** Binary `html` column (input-contract type) → text. */
  def extractBinary(html: Column): Column = extract(html.cast("string"))

  /** Scala twin for driver-side goldens — must stay semantically identical
    * to the column pipeline above (asserted in ExtractSpec). */
  def extractLocal(html: String): String = {
    var s = html
    s = s.replaceAll("(?is)<(script|style)[^>]*>.*?</\\1>", " ")
    s = s.replaceAll("(?s)<!--.*?-->", " ")
    s = s.replaceAll("(?s)<[^>]*>", " ")
    for ((from, to) <- Seq("&nbsp;" -> " ", "&amp;" -> "&", "&lt;" -> "<",
      "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'"))
      s = s.replace(from, to)
    s = s.replaceAll("&#(\\d+);", " ")
    s.replaceAll("\\s+", " ").trim
  }
}
