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

  /** String-level lowercase of one non-ASCII char — the column twin lowers
    * the WHOLE document (`lower(text)`), and full case mapping can expand a
    * char to several (U+0130 'İ' → 'i' + combining dot U+0307): per-char
    * Character.toLowerCase cannot express that and kept "İstanbul" one
    * token where the column form splits ["i","stanbul"]. Context-sensitive
    * mappings (final sigma) differ from this per-char form only in chars
    * that are token separators either way, so token streams still match.
    * ASCII never reaches here (the sinks' fast path).
    * LOCALE CAVEAT (ADVICE r5): this path pins Locale.ROOT, but the column
    * twin (`lower(text)` → String.toLowerCase) uses the JVM DEFAULT locale
    * on non-ASCII strings — under e.g. a Turkish default locale the column
    * form maps 'I'→'ı' in mixed-ASCII/non-ASCII documents while this
    * scanner's ASCII fast path maps 'I'→'i', breaking the claimed
    * token-stream parity. Entry points that compare the two paths must pin
    * the JVM default locale to ROOT (Bench does via Locale.setDefault; do
    * the same in any new harness). */
  private[extract] def loweredNonAscii(c0: Char): String =
    String.valueOf(c0).toLowerCase(java.util.Locale.ROOT)

  /** Streaming bigram tokenizer: consumes extracted characters one at a
    * time; bigrams of consecutive [a-z0-9]+ tokens (lowercased), both
    * non-stopword — identical semantics to split(lower(text), "[^a-z0-9]+")
    * + zip_with + stopword filter. */
  private final class MentionSink extends HtmlScanner.CharSink {
    private val out = new scala.collection.mutable.ArrayBuffer[String]()
    private val tok = new java.lang.StringBuilder(24)
    private var prev: String = null
    override def accept(c0: Char): Unit = {
      if (c0 < 0x80) {
        val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
        if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) { tok.append(c); () }
        else flushToken()
      } else {
        val low = loweredNonAscii(c0)
        var k = 0
        while (k < low.length) {
          val c = low.charAt(k)
          if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) { tok.append(c); () }
          else flushToken()
          k += 1
        }
      }
    }
    private def flushToken(): Unit = {
      if (tok.length > 0) {
        val t = tok.toString
        tok.setLength(0)
        if (prev != null &&
          !Tokenset.Stopwords.contains(prev) && !Tokenset.Stopwords.contains(t))
          out += (prev + " " + t)
        prev = t
      }
    }
    def finish(): Array[String] = { flushToken(); out.toArray }
  }

  def mentionsFromText(text: String): Array[String] = {
    val sink = new MentionSink
    var i = 0
    val n = text.length
    while (i < n) { sink.accept(text.charAt(i)); i += 1 }
    sink.finish()
  }

  /** Fused: extraction streams characters straight into the tokenizer —
    * the per-document extracted-text copy is never materialized. */
  def mentionsFromHtml(html: String): Array[String] = {
    val sink = new MentionSink
    HtmlScanner.extractTo(html, sink)
    sink.finish()
  }

  /** Per-partition token dictionary: interns each distinct token string
    * ONCE (open addressing, char-wise compare against the builder — no
    * allocation on the hit path) and precomputes its stopword flag. The
    * corpus produces ~10⁹ token occurrences per 10⁷ pages; without
    * interning every occurrence allocates a String + a bigram concat,
    * and the resulting allocator contention was the measured ceiling on
    * 4→16-core scaling (BENCH/BASELINE.md §1). */
  final class TokenDict(capacity0: Int = 1 << 12) {
    private var cap = Integer.highestOneBit(math.max(capacity0, 16)) * 2
    private var slots = new Array[Int](cap) // 0 = empty, else entryIndex + 1
    private var entries = new Array[String](cap / 2)
    private var stops = new Array[Boolean](cap / 2)
    private var n = 0
    def size: Int = n
    /** Ids are append-only entry indices — STABLE across resizes. */
    def token(id: Int): String = entries(id)
    def isStop(id: Int): Boolean = stops(id)

    /** Intern from a plain String (overflow-spill re-intern of the
      * in-flight previous token — off the per-occurrence hot path). */
    def internString(s: String): Int = {
      val sb = new java.lang.StringBuilder(s.length)
      sb.append(s)
      intern(sb)
    }

    def intern(sb: java.lang.StringBuilder): Int = {
      if (n * 4 >= cap * 3) resize()
      var h = 0
      var i = 0
      val len = sb.length
      while (i < len) { h = h * 31 + sb.charAt(i); i += 1 }
      var slot = h & (cap - 1)
      while (true) {
        val e = slots(slot)
        if (e == 0) {
          if (n == entries.length) {
            entries = java.util.Arrays.copyOf(entries, n * 2)
            stops = java.util.Arrays.copyOf(stops, n * 2)
          }
          val s = sb.toString
          entries(n) = s
          stops(n) = Tokenset.Stopwords.contains(s)
          slots(slot) = n + 1
          n += 1
          return n - 1
        }
        val t = entries(e - 1)
        if (t.length == len && {
          var k = 0
          var eq = true
          while (eq && k < len) { eq = t.charAt(k) == sb.charAt(k); k += 1 }
          eq
        }) return e - 1
        slot = (slot + 1) & (cap - 1)
      }
      -1 // unreachable
    }

    private def resize(): Unit = {
      cap <<= 1
      slots = new Array[Int](cap)
      var e = 0
      while (e < n) {
        val t = entries(e)
        var h = 0
        var k = 0
        while (k < t.length) { h = h * 31 + t.charAt(k); k += 1 }
        var slot = h & (cap - 1)
        while (slots(slot) != 0) slot = (slot + 1) & (cap - 1)
        slots(slot) = e + 1
        e += 1
      }
    }
  }

  /** Primitive open-addressing (long → long) counter — no boxing on the
    * hot path (java.util.HashMap[Long, Long] boxes every key probe). */
  final class LongCounter(capacity0: Int = 1 << 12) {
    private var cap = Integer.highestOneBit(math.max(capacity0, 16)) * 2
    private var keys = new Array[Long](cap)
    private var vals = new Array[Long](cap)
    private var used = new Array[Boolean](cap)
    private var n = 0
    def size: Int = n
    def add(key: Long, inc: Long): Unit = {
      if (n * 4 >= cap * 3) resize()
      var slot = (scala.util.hashing.byteswap64(key) & (cap - 1)).toInt
      while (used(slot) && keys(slot) != key) slot = (slot + 1) & (cap - 1)
      if (!used(slot)) { used(slot) = true; keys(slot) = key; n += 1 }
      vals(slot) += inc
    }
    def foreach(f: (Long, Long) => Unit): Unit = {
      var i = 0
      while (i < cap) { if (used(i)) f(keys(i), vals(i)); i += 1 }
    }
    private def resize(): Unit = {
      val (ok, ov, ou) = (keys, vals, used)
      cap <<= 1
      keys = new Array[Long](cap); vals = new Array[Long](cap); used = new Array[Boolean](cap)
      var i = 0
      while (i < ok.length) {
        if (ou(i)) {
          var slot = (scala.util.hashing.byteswap64(ok(i)) & (cap - 1)).toInt
          while (used(slot)) slot = (slot + 1) & (cap - 1)
          used(slot) = true; keys(slot) = ok(i); vals(slot) = ov(i)
        }
        i += 1
      }
    }
  }

  /** Shared per-partition counting state: dict + bigram counter. */
  final class MentionCounts {
    var dict = new TokenDict()
    var bigrams = new LongCounter()
    /** Emit (mention, count) rows (materialized — safe across reset()). */
    def iterator: Iterator[(String, Long)] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      bigrams.foreach { (key, cnt) =>
        val a = dict.token((key >>> 32).toInt)
        val b = dict.token((key & 0xffffffffL).toInt)
        buf += ((a + " " + b, cnt))
      }
      buf.iterator
    }
    /** Fresh dict + counter (mid-document overflow spill). */
    def reset(): Unit = { dict = new TokenDict(); bigrams = new LongCounter() }
  }

  /** Counting sink: zero allocation per token occurrence on the hit path —
    * tokens intern into the dict, bigram occurrences increment a primitive
    * counter keyed by the packed (prevId, tokId) pair.
    *
    * The state cap is enforced INSIDE the document too (the between-
    * documents check alone let one pathological document blow the state,
    * and a dict-only check matters as well: a page of distinct stopword-
    * adjacent tokens interns every token without ever adding a bigram).
    * The sink raises `overflowed` the moment either structure reaches
    * `maxEntries`; the scanner polls it (HtmlScanner.extractResumable)
    * and PAUSES, the owner drains `state` through its output iterator,
    * then calls [[drainReset]] and resumes the scan from the same cursor —
    * peak memory is the cap (+ ≤64 chars of pause overshoot), never the
    * document's distinct-bigram count. */
  final class CountingSink(state: MentionCounts, maxEntries: Int)
      extends HtmlScanner.CharSink {
    private val tok = new java.lang.StringBuilder(24)
    private var prevId = -1
    var overflowed = false
    override def accept(c0: Char): Unit = {
      if (c0 < 0x80) {
        val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
        if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) { tok.append(c); () }
        else flushToken()
      } else {
        // see loweredNonAscii — must match the column twin's full-string
        // lower(), which can expand one char to several
        val low = loweredNonAscii(c0)
        var k = 0
        while (k < low.length) {
          val c = low.charAt(k)
          if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) { tok.append(c); () }
          else flushToken()
          k += 1
        }
      }
    }
    private def flushToken(): Unit = {
      if (tok.length > 0) {
        val id = state.dict.intern(tok)
        tok.setLength(0)
        if (prevId >= 0 && !state.dict.isStop(prevId) && !state.dict.isStop(id))
          state.bigrams.add((prevId.toLong << 32) | (id.toLong & 0xffffffffL), 1L)
        prevId = id
        if (state.bigrams.size >= maxEntries || state.dict.size >= maxEntries)
          overflowed = true
      }
    }
    /** After the owner consumed `state.iterator` (materialized): fresh dict
      * + counter, in-flight previous token re-interned so the next bigram
      * still forms across the pause. */
    def drainReset(): Unit = {
      val prevTok = if (prevId >= 0) state.dict.token(prevId) else null
      state.reset()
      prevId = if (prevTok != null) state.dict.internString(prevTok) else -1
      overflowed = false
    }
    def finish(): Unit = { flushToken(); prevId = -1 }
  }

  /** Fused extract→tokenize→count of one document into `state`; on cap
    * overflow the scan pauses, partial counts drain through `onSpill`
    * (the downstream sum-groupBy merges partials exactly), and the scan
    * resumes from the same cursor. Returns true if any spill happened.
    * (The pipeline iterator drives the pause/resume loop itself so rows
    * stream out between pauses; this entry point is the one-shot form.) */
  def countMentionsInto(html: String, state: MentionCounts,
                        maxEntries: Int = Int.MaxValue,
                        onSpill: Iterator[(String, Long)] => Unit = _ => ()): Boolean = {
    val sink = new CountingSink(state, maxEntries)
    val st = new HtmlScanner.ScanState
    var spilled = false
    while (HtmlScanner.extractResumable(html, sink, st, () => sink.overflowed)) {
      onSpill(state.iterator)
      sink.drainReset()
      spilled = true
    }
    sink.finish()
    spilled
  }

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
