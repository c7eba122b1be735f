package graft.functions

import graft.lexical.Tokenset
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Compiled vector kernels for the similarity hot path.
  *
  * Spark's higher-order array functions (`zip_with`/`aggregate`) run
  * interpreted — a 64-plane × 64-dim signature built from them evaluates
  * ~4k interpreted expression nodes per row (measured: q17 92.7 s cold on
  * 5k vectors in round 1). These expressions do the same arithmetic as one
  * JIT-compiled loop per row behind a single virtual call (CodegenFallback,
  * the same pattern as [[graft.extract.HtmlExtractExpr]]); the FP operation
  * order is identical to the old fold (sequential, index 0..n), so results
  * are bit-compatible with both the previous plans and the DuckDB oracle's
  * `list_cosine_similarity(CAST(... AS DOUBLE[]))`.
  */
object VectorExprs {
  import org.apache.spark.sql.GraftColumnBridge._

  /** cosine(a, b) = dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))) in double
    * precision, accepting float or double array columns. */
  def cosineSim(a: Column, b: Column): Column = toColumn(CosineSimExpr(toExpr(a), toExpr(b)))

  /** Distinct word k-gram shingles (compiled single pass per document). */
  def wordShingles(text: Column, k: Int): Column =
    toColumn(WordShinglesExpr(toExpr(text), k))

  /** Random-hyperplane LSH signature packed into a Long (bits ≤ 64): bit b
    * is the sign of dot(v, h_b) for the deterministic FNV-derived ±1
    * hyperplane h_b. Bit order matches the old array form (bit b at
    * position b); band buckets are extracted with shiftrightunsigned. */
  def rhpSig(v: Column, bits: Int, dim: Int = 64): Column =
    toColumn(RhpSigExpr(toExpr(v), bits, dim))

  private[functions] def readAsDouble(arr: ArrayData, et: DataType, i: Int): Double = et match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case other => throw new IllegalArgumentException(s"numeric array expected, got $other")
  }
}

/** Exact cosine similarity between two numeric arrays (double precision,
  * sequential summation — same FP order as the fold form it replaces). */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  @transient private lazy val etL = left.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val etR = right.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dab = 0.0; var daa = 0.0; var dbb = 0.0
    var i = 0
    while (i < n) {
      val xi = VectorExprs.readAsDouble(x, etL, i)
      val yi = VectorExprs.readAsDouble(y, etR, i)
      dab += xi * yi; daa += xi * xi; dbb += yi * yi
      i += 1
    }
    dab / (math.sqrt(daa) * math.sqrt(dbb))
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cosine_sim"
}

/** Distinct word k-gram shingles in one compiled pass — replaces the
  * interpreted `transform(sequence, i => concat_ws(slice(toks, i, k)))`
  * form, which re-slices the token array per position (O(n²) allocation per
  * document, interpreted). Semantics are identical to the column form in
  * TextOps.shingles: lowercase, whitespace-split, empty tokens dropped;
  * n ≥ k → distinct k-grams (first-occurrence order), n < k → one gram of
  * all tokens joined by spaces ("" for an empty document). */
case class WordShinglesExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString.toLowerCase(java.util.Locale.ROOT)
    val toks = text.split("\\s+").filter(_.nonEmpty)
    val out = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    if (toks.length >= k) {
      val sb = new java.lang.StringBuilder(k * 12)
      var i = 0
      while (i <= toks.length - k) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out.add(org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString))
        i += 1
      }
    } else {
      out.add(org.apache.spark.unsafe.types.UTF8String.fromString(toks.mkString(" ")))
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[AnyRef](out.size())))
  }

  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)
  override def prettyName: String = "word_shingles"
}

/** Packed random-hyperplane signature: deterministic ±1 hyperplanes derived
  * from fnv1a64("rhp:b:i") — identical sign matrix to the round-1 array
  * form, one compiled loop instead of bits × dim interpreted lambdas. */
case class RhpSigExpr(child: Expression, bits: Int, dim: Int)
    extends UnaryExpression with CodegenFallback {
  require(bits >= 1 && bits <= 64, s"bits must be in [1,64], got $bits")
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  @transient private lazy val et = child.dataType.asInstanceOf[ArrayType].elementType
  // signs(b)(i) = +1.0 / -1.0, recomputed deterministically on each executor
  @transient private lazy val signs: Array[Array[Double]] =
    Array.tabulate(bits, dim)((b, i) =>
      if ((Tokenset.fnv1a64(s"rhp:$b:$i") & 1L) == 1L) 1.0 else -1.0)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val x = new Array[Double](n)
    var i = 0
    while (i < n) { x(i) = VectorExprs.readAsDouble(v, et, i); i += 1 }
    var sig = 0L
    var b = 0
    while (b < bits) {
      val p = signs(b)
      var s = 0.0
      var j = 0
      while (j < n) { s += x(j) * p(j); j += 1 }
      if (s >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): RhpSigExpr =
    copy(child = newChild)
  override def prettyName: String = "rhp_sig"
}
