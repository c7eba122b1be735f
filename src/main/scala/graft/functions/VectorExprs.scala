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

  /** Distinct word k-gram shingle hashes (compiled; long array). */
  def wordShingleHashes(text: Column, k: Int): Column =
    toColumn(WordShingleHashesExpr(toExpr(text), k))

  /** 60-bit document SimHash (compiled single pass, md5-derived word
    * hashes — DuckDB-reproducible). */
  def simhash60(text: Column): Column = toColumn(SimHashExpr(toExpr(text)))

  /** MinHash signature (compiled single-pass projection; long array). */
  def minhashSig(text: Column, k: Int, numHashes: Int): Column =
    toColumn(MinHashSigExpr(toExpr(text), k, numHashes))

  /** nProbe nearest centroid ids (compiled; cosine rounded 6 dp, ties by
    * centroid id). */
  def nearestCentroids(v: Column, ids: Seq[Long], cents: Seq[Seq[Double]],
                       nProbe: Int): Column =
    toColumn(NearestCentroidsExpr(toExpr(v), ids, cents, nProbe))

  /** Random-hyperplane LSH signature packed into a Long (bits ≤ 64): bit b
    * is the sign of dot(v - center, h_b) for the deterministic FNV-derived
    * ±1 hyperplane h_b. `center` (usually the per-dimension corpus mean,
    * rounded so an external oracle can reproduce it) is essential for
    * biased data: all-positive embeddings give every plane dot the same
    * sign and collapse the signature space (measured: 2 distinct sigs over
    * 500 uncentered synthetic vectors). Bit order: bit b at position b;
    * band buckets are extracted with shiftrightunsigned. */
  def rhpSig(v: Column, bits: Int, dim: Int = 64,
             center: Seq[Double] = Nil, bitOffset: Int = 0): Column =
    toColumn(RhpSigExpr(toExpr(v), bits, dim, center, bitOffset))

  /** murmur3 fmix64 finalizer. FNV-1a alone is NOT usable for sign bits:
    * its low bit is GF(2)-linear in the input bytes (bit 0 survives the odd
    * multiply unchanged), so ±1 planes derived from `fnv & 1` collapse to
    * two alternating rows — measured: 2 distinct signatures over 500
    * vectors, ANN recall stuck at 0.57 for every (bits, bands). */
  def fmix64(h0: Long): Long = {
    var h = h0
    h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL
    h ^= (h >>> 33); h *= 0xc4ceb9fe1a85ec53L
    h ^= (h >>> 33)
    h
  }

  /** The deterministic ±1 hyperplane sign for (plane b, dimension i) —
    * single source of truth shared by RhpSigExpr and the DuckDB oracle
    * literal generator (SparkEntry.planesValues). */
  def rhpSign(b: Int, i: Int): Double =
    if ((fmix64(graft.lexical.Tokenset.fnv1a64(s"rhp:$b:$i")) & 1L) == 1L) 1.0 else -1.0

  private[functions] def readAsDouble(arr: ArrayData, et: DataType, i: Int): Double = et match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case other => throw new IllegalArgumentException(s"numeric array expected, got $other")
  }

  /** Compiled once and shared: String.split(regex) compiles a fresh
    * java.util.regex.Pattern on EVERY call — one per row on the text
    * kernels' hot paths (the same class of per-row waste the thread-local
    * MD5 in SimHashExpr exists to avoid). */
  private[functions] val WS: java.util.regex.Pattern =
    java.util.regex.Pattern.compile("\\s+")

  /** Lowercase, whitespace-split, drop empties, then emit every k-gram in
    * position order (n < k ⇒ ONE gram of all tokens joined; "" for an
    * empty document) — the single source of the gram semantics shared
    * bit-for-bit by WordShinglesExpr, WordShingleHashesExpr, and
    * MinHashSigExpr (previously triplicated; each caller keeps its own
    * distinct-set, so dedup identity — string vs hash — is unchanged). */
  private[functions] def forEachGram(input: Any, k: Int)(f: String => Unit): Unit = {
    val text = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString.toLowerCase(java.util.Locale.ROOT)
    val toks = WS.split(text).filter(_.nonEmpty)
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
        f(sb.toString)
        i += 1
      }
    } else f(toks.mkString(" "))
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
    // fail fast, don't truncate: a min(n)-dim dot drops the wider side's
    // tail mass from the DENOMINATOR too, returning a plausible but
    // inflated cosine (mixed-width frames — the RhpSigExpr guard's exact
    // failure family). The fold form this kernel replaced returned NULL
    // on unequal lengths; an error beats both a null and a wrong number.
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"cosine_sim: mismatched embedding widths ${x.numElements()} vs " +
          s"${y.numElements()} — re-embed to a single width before comparing")
    val n = x.numElements()
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
    val out = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    VectorExprs.forEachGram(input, k) { g =>
      out.add(org.apache.spark.unsafe.types.UTF8String.fromString(g)); ()
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[AnyRef](out.size())))
  }

  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)
  override def prettyName: String = "word_shingles"
}

/** Distinct word k-gram shingle FNV-1a64 hashes in one compiled pass — the
  * verification-side twin of [[WordShinglesExpr]]: identical tokenization
  * and gram construction, but emits the 64-bit hash of each gram so the
  * candidate-verification join shuffles long arrays instead of k-word
  * string arrays and set-intersects longs. Intersection/union sizes over
  * the hashes equal those over the strings up to 2⁻⁶⁴-scale collisions. */
case class WordShingleHashesExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = {
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    VectorExprs.forEachGram(input, k) { g =>
      out.add(graft.lexical.Tokenset.fnv1a64(g)); ()
    }
    val arr = new Array[Long](out.size())
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashesExpr =
    copy(child = newChild)
  override def prettyName: String = "word_shingle_hashes"
}

/** The nProbe nearest centroids of a vector (by cosine rounded to 6 dp,
  * ties broken by centroid id — the rounding keeps the argmax reproducible
  * in the DuckDB oracle) as an array of centroid ids. Centroid matrix is
  * embedded in the expression (collected once on the driver — IVF lists
  * are by construction far smaller than the corpus). */
case class NearestCentroidsExpr(child: Expression, ids: Seq[Long],
                                cents: Seq[Seq[Double]], nProbe: Int)
    extends UnaryExpression with CodegenFallback {
  require(ids.nonEmpty && ids.length == cents.length && nProbe >= 1)
  require(cents.forall(_.length == cents.head.length),
    "centroids must share one embedding width (mixed-width corpus sample)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val et = child.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val cm: Array[Array[Double]] = cents.map(_.toArray).toArray
  @transient private lazy val cnorm: Array[Double] =
    cm.map(c => math.sqrt(c.map(x => x * x).sum))

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    // fail fast on width mismatch: a min(n)-dim dot against a full-width
    // input norm systematically deflates every probe score (cell
    // assignment degrades to noise with no failure signal) — the same
    // mixed-width family the cosine/RHP kernels now guard against
    if (n != cm(0).length)
      throw new IllegalArgumentException(
        s"nearest_centroids: $n-dim input vs ${cm(0).length}-dim centroids " +
          "— re-embed to a single width before IVF assignment")
    val x = new Array[Double](n)
    var i = 0
    while (i < n) { x(i) = VectorExprs.readAsDouble(v, et, i); i += 1 }
    var vn = 0.0
    i = 0
    while (i < n) { vn += x(i) * x(i); i += 1 }
    vn = math.sqrt(vn)
    val scored = Array.tabulate(cm.length) { c =>
      val cv = cm(c)
      var d = 0.0
      var j = 0
      while (j < n) { d += x(j) * cv(j); j += 1 }
      val cos = d / (vn * cnorm(c))
      // zero-norm input/centroid ⇒ NaN; rank it last (BigDecimal(NaN)
      // would throw and fail the whole job, unlike the exact path which
      // just sorts the NaN)
      val cosr =
        if (cos.isNaN) Double.NegativeInfinity
        else BigDecimal(cos).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (cosr, ids(c))
    }
    val top = scored.sortBy { case (cos, id) => (-cos, id) }.take(nProbe).map(_._2)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(top)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidsExpr =
    copy(child = newChild)
  override def prettyName: String = "nearest_centroids"
}

/** MinHash signature of a document in ONE compiled pass — a projection,
  * not an aggregation: tokenize, build distinct k-gram FNV hashes (same
  * gram construction as WordShingleHashesExpr), then take per-seed minima
  * of multiply-add permutations over the 64-bit ring (a_i odd — the
  * standard universal-hashing MinHash family; wraparound multiplication is
  * fine in JVM code where the ANSI SQL planner would reject it). The
  * relational explode→groupBy form shuffled ~129 longs per document per
  * input partition (≈1 GB at 10⁶ docs) and capped dedup scaling at ~0.6;
  * as a projection the signature costs grams × numHashes fused
  * multiply-adds per row and shuffles nothing. */
case class MinHashSigExpr(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && numHashes >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val as: Array[Long] =
    Array.tabulate(numHashes)(i =>
      VectorExprs.fmix64(graft.lexical.Tokenset.fnv1a64(s"mh:a:$i")) | 1L)
  @transient private lazy val bs: Array[Long] =
    Array.tabulate(numHashes)(i =>
      VectorExprs.fmix64(graft.lexical.Tokenset.fnv1a64(s"mh:b:$i")))

  override protected def nullSafeEval(input: Any): Any = {
    val grams = new java.util.LinkedHashSet[java.lang.Long]()
    VectorExprs.forEachGram(input, k) { g =>
      grams.add(graft.lexical.Tokenset.fnv1a64(g)); ()
    }
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val it = grams.iterator()
    while (it.hasNext) {
      val g = it.next().longValue()
      var s = 0
      while (s < numHashes) {
        val v = as(s) * g + bs(s)
        if (v < mins(s)) mins(s) = v
        s += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

/** 60-bit SimHash of a document in ONE compiled pass: lowercase,
  * whitespace-tokenize, md5-derive a 60-bit hash per word occurrence
  * (bit-identical to TextOps.md5Long / the DuckDB oracle:
  * conv(substr(md5(w),1,15),16,10)), majority-vote the bits. Replaces the
  * relational explode(words) × explode(60 bit positions) plan, which
  * pushed words×60 rows (≈2·10⁹ at 3·10⁵ docs) through two shuffles —
  * here the corpus is touched once and nothing is exploded at all. */
case class SimHashExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString.toLowerCase(java.util.Locale.ROOT)
    val md = SimHashExpr.digests.get()
    val votes = new Array[Int](60)
    val toks = VectorExprs.WS.split(text) // shared compiled Pattern (per-row split() recompiled it)
    var t = 0
    while (t < toks.length) {
      val w = toks(t)
      if (w.nonEmpty) {
        md.reset()
        val d = md.digest(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first 15 hex chars = high 60 bits of the first 7.5 bytes
        var h = 0L
        var i = 0
        while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
        h >>>= 4 // keep the leading 15 hex digits (60 bits)
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
  override def prettyName: String = "simhash60"
}

object SimHashExpr {
  /** One MD5 instance per executor thread — `getInstance` per row is an
    * allocation the 10^12-row plan doesn't need; expression instances may
    * be shared across tasks, so a plain lazy val would race. */
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
}

/** Packed random-hyperplane signature: deterministic ±1 hyperplanes derived
  * from fnv1a64("rhp:b:i") — identical sign matrix to the round-1 array
  * form, one compiled loop instead of bits × dim interpreted lambdas. */
case class RhpSigExpr(child: Expression, bits: Int, dim: Int,
                      center: Seq[Double] = Nil, bitOffset: Int = 0)
    extends UnaryExpression with CodegenFallback {
  require(bits >= 1 && bits <= 64, s"bits must be in [1,64], got $bits")
  require(bitOffset >= 0, s"bitOffset must be >= 0, got $bitOffset")
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  @transient private lazy val et = child.dataType.asInstanceOf[ArrayType].elementType
  // signs(b)(i) = +1.0 / -1.0, recomputed deterministically on each
  // executor. bitOffset shifts into a disjoint region of the global plane
  // family (plane identity is the absolute bit index), so >64-bit
  // signatures split across words draw independent hyperplanes per word
  // (SimOps.banded multi-word path); offset 0 is bit-identical to the
  // round-2 expression and the q18 oracle literals.
  @transient private lazy val signs: Array[Array[Double]] =
    Array.tabulate(bits, dim)((b, i) => VectorExprs.rhpSign(b + bitOffset, i))
  @transient private lazy val centerArr: Array[Double] = center.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    // per-row width guard: SimOps.requireWidth probes only one row per
    // call, so a mixed-width frame (e.g. a union of 64-dim legacy vectors
    // with 768-dim re-embedded rows) can pass the driver check and still
    // reach here with rows wider than the plane table — which would sign
    // over the first `dim` dims only and degenerate the buckets (the
    // 768-dim drive failure). Narrower rows are fine (missing dims read 0).
    if (v.numElements() > dim)
      throw new IllegalArgumentException(
        s"rhp_sig: ${v.numElements()}-dim embedding exceeds the $dim-dim " +
          "plane table — pass the real embedding width (dimensions above " +
          "the table width would be silently ignored)")
    // narrower rows: dims >= n contribute NOTHING to the plane dot (they
    // read as the center value, not as zero — a zero-padded twin of the
    // same vector would add (0 - center_i)·sign_i terms). Deliberate and
    // matched bit-for-bit by the driver twin BandedIndex.signature, so
    // both paths bucket narrow rows identically.
    val n = math.min(v.numElements(), dim)
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      x(i) = VectorExprs.readAsDouble(v, et, i) -
        (if (i < centerArr.length) centerArr(i) else 0.0)
      i += 1
    }
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
