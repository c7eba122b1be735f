package graft.extract

import graft.lexical.Tokenset
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-partition mention detection: html → extracted text → lowercase
  * tokens → stopword-filtered word bigrams, in one pass with no intermediate
  * columns. Equals `KgPipeline.mentionBigrams(HtmlExtract.extract(html))`
  * exactly (asserted in ExtractSpec) while skipping the text/lower/split
  * column materializations — extraction was allocation-bound, not CPU-bound,
  * at corpus scale. */
object MentionScanner {

  /** Bigrams of consecutive [a-z0-9]+ tokens (lowercased), both tokens
    * non-stopword — identical semantics to split(lower(text), "[^a-z0-9]+")
    * + zip_with + stopword filter. */
  def mentionsFromText(text: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    val n = text.length
    var i = 0
    var prev: String = null
    val tok = new java.lang.StringBuilder(24)
    while (i <= n) {
      val c = if (i < n) Character.toLowerCase(text.charAt(i)) else ' '
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) tok.append(c)
      else {
        if (tok.length > 0) {
          val t = tok.toString
          tok.setLength(0)
          if (prev != null &&
            !Tokenset.Stopwords.contains(prev) && !Tokenset.Stopwords.contains(t))
            out += (prev + " " + t)
          prev = t
        }
      }
      i += 1
    }
    out.toArray
  }

  def mentionsFromHtml(html: String): Array[String] =
    mentionsFromText(HtmlScanner.extract(html))

  /** Column form over raw html (binary or string). */
  def mentionsColumn(html: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    toColumn(HtmlMentionsExpr(toExpr(html.cast("string"))))
  }
}

/** html string → array<string> of mention bigrams, one fused pass. */
case class HtmlMentionsExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(input: Any): Any = {
    val mentions = MentionScanner.mentionsFromHtml(input.asInstanceOf[UTF8String].toString)
    new GenericArrayData(mentions.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }
  override protected def withNewChildInternal(newChild: Expression): HtmlMentionsExpr =
    copy(child = newChild)
  override def prettyName: String = "html_mentions"
}
