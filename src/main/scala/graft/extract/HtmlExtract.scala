package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic HTML → text extraction (SURVEY.md L7 — not in the
  * reference; required by the input contract: byte-identical extracted text
  * per url across runs and parallelism levels).
  *
  * Canonical implementation: the single-pass [[HtmlScanner]] (one char loop,
  * one output buffer). A chained-regexp column pipeline was the v0
  * implementation; it allocated ~10 intermediate copies per document, which
  * made corpus extraction allocation-bound on top of carrying a sequential-
  * replace artifact (`&amp;lt;` double-decoded to `<`). The scanner is
  * exposed to Catalyst as a custom expression so the plan stays a single
  * projection with no UDF registration.
  */
object HtmlExtract {

  /** Column form: custom Catalyst expression over the canonical scanner. */
  def extract(html: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    toColumn(HtmlExtractExpr(toExpr(html)))
  }

  /** Binary `html` column (input-contract type) → text. */
  def extractBinary(html: Column): Column = extract(html.cast("string"))

  /** Driver-side canonical extractor (used by the webtext generator to
    * produce the golden `text` column — identical function, so the
    * byte-identity invariant is exact by construction). */
  def extractLocal(html: String): String = HtmlScanner.extract(html)
}

/** Scalar expression wrapping the single-pass extractor. Deterministic,
  * null-safe; CodegenFallback (a single virtual call per row — the cost is
  * the scan itself, not the dispatch). */
case class HtmlExtractExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(HtmlScanner.extract(input.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(newChild: Expression): HtmlExtractExpr =
    copy(child = newChild)
  override def prettyName: String = "html_extract"
}
