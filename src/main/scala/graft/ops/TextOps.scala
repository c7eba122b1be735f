package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text-analysis and deduplication operators for a document corpus
  * `documents(doc_id LONG, text STRING, ...)` — the training-data-pipeline
  * operator family (language ID, quality scoring, token counting,
  * fingerprinting; exact / MinHash / SimHash / n-gram-Jaccard dedup).
  *
  * Everything is built from codegen'd `functions._` column expressions
  * (no UDFs): whole-stage codegen keeps these in one pass over the corpus,
  * and every hash is md5-derived so the DuckDB oracle can reproduce values
  * bit-exactly (`conv(substr(md5(x),1,15),16,10)` ⇔
  * `CAST('0x'||substr(md5(x),1,15) AS BIGINT)`).
  */
object TextOps {

  /** Whitespace-canonical lowercase text — the dedup normalization. */
  def normText(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Deterministic document fingerprint (md5 of normalized text). */
  def fingerprint(text: Column): Column = md5(normText(text))

  /** Non-empty whitespace-separated token array. */
  def words(text: Column): Column =
    filter(split(lower(text), "\\s+"), w => w =!= "")

  /** 64-bit-ish (60-bit) deterministic hash reproducible in DuckDB. */
  def md5Long(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  // --- Quality / stats ---------------------------------------------------

  val EnStop: Seq[String] = Seq("the", "and", "of", "to", "in", "a", "is", "that", "for", "it", "with", "on", "as")
  val DeStop: Seq[String] = Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit", "von", "auf")
  val FrStop: Seq[String] = Seq("le", "la", "les", "et", "est", "un", "une", "de", "des", "que", "pour", "dans")

  private def stopHits(toks: Column, stops: Seq[String]): Column =
    size(filter(toks, w => array_contains(lit(stops.toArray), w)))

  /** Per-document quality counters (integer-exact for oracle hashing):
    * characters, words, punctuation marks, digits, stopword hits. */
  def qualityStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = words(col(textCol))
    df.select(
      col("doc_id"),
      length(col(textCol)).as("n_chars"),
      size(toks).as("n_words"),
      (length(col(textCol)) - length(regexp_replace(col(textCol), "[.,;:!?'\"()]", ""))).as("n_punct"),
      (length(col(textCol)) - length(regexp_replace(col(textCol), "[0-9]", ""))).as("n_digits"),
      stopHits(toks, EnStop).as("n_stop_en"))
  }

  /** Heuristic language ID: argmax of stopword-hit counts over en/de/fr
    * (ties → 'und'). SQL-expressible on both engines. */
  def langId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = words(col(textCol))
    val en = stopHits(toks, EnStop)
    val de = stopHits(toks, DeStop)
    val fr = stopHits(toks, FrStop)
    df.select(col("doc_id"), en.as("en_hits"), de.as("de_hits"), fr.as("fr_hits"))
      .withColumn("lang_pred",
        when(col("en_hits") > col("de_hits") && col("en_hits") > col("fr_hits"), "en")
          .when(col("de_hits") > col("en_hits") && col("de_hits") > col("fr_hits"), "de")
          .when(col("fr_hits") > col("en_hits") && col("fr_hits") > col("de_hits"), "fr")
          .otherwise("und"))
  }

  /** Token counting: words plus a BPE-ish subword proxy (runs of letters,
    * digits, or single punctuation — the regex token count). */
  def tokenCounts(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(
      col("doc_id"),
      size(words(col(textCol))).as("n_words"),
      size(regexp_extract_all(lower(col(textCol)),
        lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0))).as("n_subtokens"),
      length(col(textCol)).as("n_chars"))

  // --- Dedup -------------------------------------------------------------

  /** Exact dedup: canonical = min doc_id per identical normalized text.
    * One hash-shuffle on the fingerprint; at 100 TB this is the cheapest
    * pass and the fingerprint groupBy is the only wide dependency. */
  def exactDuplicates(df: DataFrame, textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(col("fp"))
    df.select(col("doc_id"), fingerprint(col(textCol)).as("fp"))
      .withColumn("canonical_id", min("doc_id").over(w))
      .withColumn("group_size", count("*").over(w))
      .filter(col("group_size") > 1)
      .select(col("doc_id"), col("canonical_id"), col("group_size"))
  }

  /** Word k-gram shingle set (distinct, as array) — compiled single-pass
    * expression (graft.functions.WordShinglesExpr); the column-function
    * form re-sliced the token array per gram position, O(n²) interpreted
    * allocation per document. */
  def shingles(text: Column, k: Int): Column =
    graft.functions.VectorExprs.wordShingles(text, k)

  /** Exploded (doc_id, shingle-hash) pairs with per-doc set sizes — grams
    * are hashed inside the compiled shingle pass; no k-word strings are
    * materialized. */
  private def shingleHashTable(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(col("doc_id"),
        graft.functions.VectorExprs.wordShingleHashes(col(textCol), k).as("shs"))
      .withColumn("set_size", size(col("shs")))
      .select(col("doc_id"), col("set_size"), explode(col("shs")).as("sh"))

  /** n-gram Jaccard near-dup pairs (a < b) with similarity ≥ threshold.
    * Inverted-index join on shingles: |∩| by groupBy pair, |∪| from set
    * sizes. `maxShingleFreq` drops ultra-common shingles before the
    * self-join — the skew guard that keeps the join quadratic only within
    * a shingle's posting list, never corpus-wide.
    *
    * Exactness contract: the df ≥ 2 lower bound loses nothing (a shingle
    * in one document cannot intersect anything), so (inter, uni, jaccard)
    * are the exact rationals AS LONG AS no shingle's document frequency
    * exceeds `maxShingleFreq`. Beyond it the guard prices in an
    * approximation: pruned shingles are missing from `inter` but not from
    * the set-size-based `uni`, so `jaccard` is a LOWER BOUND, and a pair
    * whose entire overlap sits in ultra-common shingles does not surface
    * at all (boilerplate-dominated near-dups on real web text). That is
    * usually the WANTED dedup semantics — boilerplate overlap is not
    * duplication — but for exact ground truth on a bounded corpus pass
    * `maxShingleFreq` above the corpus's max df (cf. [[minhashPairs]],
    * whose verification uses full array intersection and therefore scores
    * the candidates it does surface exactly). */
  def jaccardPairs(df: DataFrame, textCol: String = "text", k: Int = 3,
                   threshold: Double = 0.8, maxShingleFreq: Int = 1000): DataFrame = {
    // Shingles are 64-bit-hashed inside the compiled gram pass: the
    // exploded table shuffles 8-byte keys instead of k-word strings. (A
    // hash collision could in principle merge two shingles — p ≈ n²/2⁶⁵,
    // immaterial below ~10⁹ distinct shingles per skew-guarded posting
    // list.)
    val st = shingleHashTable(df, textCol, k)
    // df_freq prune: partial-agg count (map-side combined, tiny rows), then
    // posting lists per surviving shingle. The join and the groupBy share
    // the `sh` hash partitioning, so the exploded table is shuffled ONCE;
    // pairs are generated by exploding within each posting list — quadratic
    // only inside a list, bounded by maxShingleFreq (the skew guard).
    // When the guard is pinned OFF (Int.MaxValue — the exact-ground-truth
    // mode, q13's oracle config) the pre-count prunes nothing and the old
    // count+join pass built the IDENTICAL full posting lists anyway, so it
    // was a pure extra aggregation round: aggregate the lists directly and
    // apply both bounds to the list length (size >= 2 ⇔ df >= 2). With a
    // finite guard the pre-count stays — it is what keeps an over-cap
    // shingle's list from ever being materialized.
    val posting =
      if (maxShingleFreq == Int.MaxValue)
        st.groupBy("sh").agg(collect_list(struct(col("doc_id"), col("set_size"))).as("ps"))
          .filter(size(col("ps")) >= 2)
      else {
        val freq = st.groupBy("sh").agg(count("*").as("df_freq"))
          .filter(col("df_freq").between(2, maxShingleFreq))
        st.join(freq, "sh")
          .groupBy("sh").agg(collect_list(struct(col("doc_id"), col("set_size"))).as("ps"))
      }
    val inter = posting
      .select(explode(col("ps")).as("x"), col("ps"))
      .select(col("x.doc_id").as("a"), col("x.set_size").as("sa"), explode(col("ps")).as("y"))
      .filter(col("a") < col("y.doc_id"))
      .groupBy(col("a"), col("y.doc_id").as("b"), col("sa"), col("y.set_size").as("sb"))
      .agg(count("*").as("inter"))
    inter
      .withColumn("uni", col("sa") + col("sb") - col("inter"))
      .withColumn("jaccard", round(col("inter").cast("double") / col("uni"), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("inter"), col("uni"), col("jaccard"))
  }

  /** MinHash signature per document as a compiled PROJECTION -- zero
    * shuffles (graft.functions.MinHashSigExpr). Evolution, each step
    * measured at sf0.1 / the 10^6-doc dedup bench: round 1 exploded
    * shingles x numHashes before a groupBy (128x shuffle volume, 75 s);
    * a map-side-combining groupBy with numHashes min-agg columns cut that
    * to 7.6 s but still pushed ~(numHashes+1) longs per doc per input
    * partition through the exchange, capping dedup-family scaling at ~0.6;
    * the projection form shuffles nothing and scales with the scan.
    * Returns (doc_id, sig ARRAY<LONG>[numHashes]). */
  def minhashSignatures(df: DataFrame, textCol: String, k: Int, numHashes: Int): DataFrame =
    df.select(col("doc_id"),
      graft.functions.VectorExprs.minhashSig(col(textCol), k, numHashes).as("sig"))

  /** Banded-LSH candidate pairs (a < b, distinct) BEFORE exact
    * verification — the blocking stage of [[minhashPairs]], exposed so the
    * banding sweep (graft.MinHashSweepBench) can measure candidate-pair
    * rate per (numHashes, bands) config separately from banding recall.
    *
    * Skew semantics of the default posting-list plan (rows ≥ 4 only): a
    * bucket beyond `maxBucketSize` members emits full pairs within its
    * `maxBucketSize` smallest ids plus STAR edges (min-id, y) for the
    * tail — every member still surfaces against the cluster
    * representative, but a tail member similar to its neighbors and NOT
    * to the representative can fail verification and drop out of
    * [[minhashPairs]]. That is a deliberate approximation: an oversized
    * bucket at these geometries is a near-identical boilerplate cluster,
    * and exhaustive pairs there are O(|bucket|²) work by definition. For
    * exhaustive-pair semantics regardless of skew pass
    * `maxBucketSize = Int.MaxValue` (bounded memory: lists explode
    * per-bucket) or `postingListPlan = Some(false)` (the self-join plan,
    * exact at any bucket size). */
  def minhashCandidates(df: DataFrame, textCol: String = "text", k: Int = 3,
                        numHashes: Int = 128, bands: Int = 16,
                        postingListPlan: Option[Boolean] = None,
                        maxBucketSize: Int = 1024): DataFrame =
    minhashCandidatesImpl(df, textCol, k, numHashes, bands, postingListPlan,
      maxBucketSize, dedup = true)

  /** [[minhashCandidates]] with the output-pair dedup optional: a consumer
    * that only probes membership (the posting-verify left_semi) is
    * insensitive to duplicate pairs, and the self-join plan's distinct is
    * a full exchange + aggregation over the raw join output (a pair
    * surfaces once per shared band — ~10× the distinct pair count at
    * rows = 1 geometries). Consumers that JOIN against the pairs must keep
    * dedup = true or duplicate their output. */
  private def minhashCandidatesImpl(df: DataFrame, textCol: String, k: Int,
                                    numHashes: Int, bands: Int,
                                    postingListPlan: Option[Boolean],
                                    maxBucketSize: Int,
                                    dedup: Boolean): DataFrame = {
    require(numHashes % bands == 0)
    val rows = numHashes / bands
    // the band index is mixed INTO the bucket hash: a single 8-byte join
    // key instead of (band, bucket) — less shuffle volume, single-column
    // probe (cross-band hash collisions are 2^-64-scale noise and the
    // verification is exact regardless)
    val banded = minhashSignatures(df, textCol, k, numHashes)
      .withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("bucket",
        xxhash64(col("band"), slice(col("sig"), col("band") * rows + 1, lit(rows))))
      .select(col("doc_id"), col("bucket"))
    // Candidate generation, two plans by banding geometry:
    //
    // rows < 4 (e.g. q14's oracle-exact 128/128, rows = 1): bucket keys
    // have low entropy → few, GIANT buckets. A posting-list rewrite here
    // carries the whole id array into every exploded row — O(|list|²)
    // bytes per bucket — measured 3× WORSE in round 3 and reverted; the
    // self-join's single reused exchange (identical subplan →
    // ReusedExchange) is the right plan.
    //
    // rows ≥ 4 (the production 128/16, rows = 8, recall-swept §9): bucket
    // keys are effectively unique per near-dup cluster, so posting lists
    // are tiny (dup-cluster-sized) and ~99% of buckets are singletons. A
    // groupBy(bucket) posting-list plan shuffles the same banded rows
    // ONCE, drops singleton buckets BEFORE pair generation, and skips the
    // join's second exchange read + hash-relation build. `maxBucketSize`
    // is the skew guard (the q13 maxShingleFreq pattern): an adversarial
    // equal-signature flood truncates deterministically (id-sorted) to
    // cap the quadratic explode; dup-cluster buckets are orders of
    // magnitude below it.
    if (postingListPlan.getOrElse(rows >= 4)) {
      // skew guard: full quadratic pairs within the first maxBucketSize
      // ids (deterministic, id-sorted), STAR edges (min-id, y) beyond it —
      // every member of an oversized cluster still surfaces as a verified
      // duplicate of the cluster's representative, without materializing
      // an O(|bucket|²) pair list for a 10⁵-member boilerplate cluster
      // (the self-join would stream those pairs but also verify every one
      // of them — quadratic WORK either way; the star keeps dedup
      // connectivity at linear cost). Dup-cluster buckets at the rows ≥ 4
      // geometries this plan serves are orders of magnitude below the cap.
      banded.groupBy(col("bucket"))
        .agg(array_sort(collect_list(col("doc_id"))).as("ids0"))
        .filter(size(col("ids0")) >= 2)
        .withColumn("ids", slice(col("ids0"), 1, maxBucketSize))
        .select(explode(expr(
          // interpreted HOFs are fine HERE: only non-singleton buckets
          // survive the filter and their lists are dup-cluster-sized
          "concat(" +
            "flatten(transform(ids, (x, i) -> " +
            "  transform(slice(ids, i + 2, size(ids)), y -> named_struct('a', x, 'b', y)))), " +
            s"transform(slice(ids0, ${maxBucketSize + 1}, size(ids0)), " +
            "  y -> named_struct('a', element_at(ids, 1), 'b', y)))")).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        // two bands of one doc can collide into the same 64-bit bucket
        // value, putting the doc in a list twice — the self-join's
        // x.doc_id < y.doc_id predicate excluded the resulting self-pair
        .filter(col("a") =!= col("b"))
        .distinct()
    } else {
      // SHUFFLE_HASH (guide §3.1): the banded rows are 16-byte (bucket,
      // doc_id) pairs, so each post-shuffle partition's hash table is
      // compact and the two full sorts a sort-merge join would pay on the
      // exploded table (numHashes rows per doc per side) are pure
      // overhead; equi-key hash lookup preserves the x.doc_id < y.doc_id
      // filter semantics unchanged
      val raw = banded.as("x").hint("SHUFFLE_HASH").join(banded.as("y"),
          col("x.bucket") === col("y.bucket") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      if (dedup) raw.distinct() else raw
    }
  }

  /** MinHash-LSH near-dup pairs: band the signature, join on band buckets
    * ([[minhashCandidates]]), then verify candidates with exact Jaccard ≥
    * threshold. The band join is the blocking step that replaces the
    * all-pairs product at scale (SURVEY.md §7.1 step 5); verification uses
    * full array intersection/union, so every surfaced pair carries its
    * exact Jaccard, and the output equals an all-pairs exact scan whenever
    * banding recall is 1 (it can even EXCEED [[jaccardPairs]] on corpora
    * where that plan's `maxShingleFreq` guard binds — see its exactness
    * contract).
    *
    * Default (numHashes=128, bands=16, rows=8) is the committed sweep's
    * winner at the production threshold 0.8 (graft.MinHashSweepBench,
    * BENCH/BASELINE.md §9): the most selective config above the 0.95
    * banding-recall bar (0.988 recall at 0.102 candidates/doc — rows=1
    * settings like q14's oracle-exact one admit every mildly-similar pair,
    * 63% more candidates on the graded corpus and unboundedly more on real
    * web text). S-curve midpoint (1/16)^(1/8) ≈ 0.71. */
  def minhashPairs(df: DataFrame, textCol: String = "text", k: Int = 3,
                   numHashes: Int = 128, bands: Int = 16,
                   threshold: Double = 0.8,
                   maxBucketSize: Int = 1024,
                   postingListVerify: Option[Boolean] = None): DataFrame = {
    val rows = numHashes / bands
    val postingVerify = postingListVerify.getOrElse(rows < 4) && threshold > 0
    // the posting-verify branch consumes the candidates ONLY as a
    // left_semi probe side, so the pair dedup (a full exchange +
    // aggregation over the per-shared-band join output) is skipped there
    val cand = minhashCandidatesImpl(df, textCol, k, numHashes, bands,
      postingListPlan = None, maxBucketSize = maxBucketSize,
      dedup = !postingVerify)
    // Exact-Jaccard verification, two plans by candidate density (the
    // minhashCandidates geometry switch, measured in round 6):
    //
    // rows < 4 (e.g. q14's oracle-exact 128/128): banding at these
    // geometries admits nearly every pair with ANY overlap — ~760k
    // candidates on 5k sf0.1 docs — and an array-carry verification
    // shuffles both docs' full shingle-hash arrays per candidate pair
    // (O(cand × setSize) bytes; the measured bulk of the query). Instead,
    // compute (inter, uni) for ALL overlapping corpus pairs at once with
    // the q13 posting-list aggregation (shuffle volume O(Σ df²) of
    // 8-byte keys, shared across pairs) and keep the candidate pairs via
    // an equi-join on (a, b). Exactness: a candidate pair absent from the
    // posting-list pairs has inter = 0, i.e. jaccard = 0 < threshold, so
    // for threshold > 0 the output is row-identical to the array plan
    // (thresholds <= 0 are not a dedup setting; the array plan serves
    // them). No candidate-id pre-prune here: at rows < 4 nearly every doc
    // with any overlap IS a candidate endpoint by construction, so the
    // prune dropped ~nothing while its candIds side re-executed the whole
    // candidate subplan a second time (measured: the un-pruned plan halves
    // the candidate work; the posting pass already bounds verification by
    // the corpus, not the candidate count).
    //
    // rows >= 4 (the production 128/16): candidates are dup-cluster-rare,
    // so the per-pair array plan (over a corpus semi-join pruned to
    // candidate endpoints) touches far fewer rows than a corpus
    // posting-list pass and stays the winner.
    if (postingVerify) {
      val st = shingleHashTable(df, textCol, k)
      val posting = st.groupBy("sh")
        .agg(collect_list(struct(col("doc_id"), col("set_size"))).as("ps"))
        .filter(size(col("ps")) >= 2)
      val inter = posting
        .select(explode(col("ps")).as("x"), col("ps"))
        .select(col("x.doc_id").as("a"), col("x.set_size").as("sa"), explode(col("ps")).as("y"))
        .filter(col("a") < col("y.doc_id"))
        .groupBy(col("a"), col("y.doc_id").as("b"), col("sa"), col("y.set_size").as("sb"))
        .agg(count("*").as("inter"))
      inter.join(cand, Seq("a", "b"), "left_semi")
        .withColumn("uni", col("sa") + col("sb") - col("inter"))
        .withColumn("jaccard", round(col("inter").cast("double") / col("uni"), 6))
        .filter(col("jaccard") >= threshold)
        .select(col("a"), col("b"), col("inter"), col("uni"), col("jaccard"))
    } else {
      // the corpus is semi-join pruned to docs that appear in a candidate
      // pair BEFORE any shingle work: verification cost must scale with
      // the candidate set, not the corpus — un-pruned, the verification
      // joins shuffled the full corpus's hash arrays (~0.8 GB per side at
      // 10⁶ docs), the measured bulk of the minhash phase regardless of
      // how few candidates surfaced.
      val candIds = cand
        .select(explode(array(col("a"), col("b"))).as("doc_id")).distinct()
      val pruned = df.join(candIds, Seq("doc_id"), "left_semi")
      // join back the compiled long-hash shingle arrays (8-byte elements
      // through the shuffle and the set ops, instead of k-word strings)
      val texts = pruned.select(col("doc_id"),
        graft.functions.VectorExprs.wordShingleHashes(col(textCol), k).as("sh"))
      val withSets = cand
        .join(texts.select(col("doc_id").as("a"), col("sh").as("shA")), Seq("a"))
        .join(texts.select(col("doc_id").as("b"), col("sh").as("shB")), Seq("b"))
        .withColumn("inter", size(array_intersect(col("shA"), col("shB"))))
        .withColumn("uni", size(array_union(col("shA"), col("shB"))))
        .withColumn("jaccard", round(col("inter").cast("double") / col("uni"), 6))
      withSets.filter(col("jaccard") >= threshold)
        .select(col("a"), col("b"), col("inter"), col("uni"), col("jaccard"))
    }
  }

  /** 60-bit SimHash per document (bit-majority vote over md5-derived word
    * hashes, DuckDB-reproducible — q15) in one compiled pass per document
    * (graft.functions.SimHashExpr). The round-1 relational form exploded
    * words × 60 bit positions through two shuffles — ~2·10⁹ shuffled rows
    * at 3·10⁵ docs; this touches the corpus once with no explode.
    * Returns (doc_id, sig). */
  def simhashSigs(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(col("doc_id"),
      graft.functions.VectorExprs.simhash60(col(textCol)).as("sig"))

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, blocked on
    * maxDist+1 signature slices (pigeonhole: a pair differing in ≤ maxDist
    * bits leaves at least one of maxDist+1 disjoint slices untouched, so
    * it always shares a block key — recall 1 at every radius, unlike a
    * fixed 4-block layout whose guarantee stops at distance 3). maxDist=3
    * reproduces the original 4 × 15-bit quarters bit-for-bit. Wider radii
    * trade selectivity (narrower slices ⇒ bigger buckets) for the same
    * guarantee; the exact Hamming filter stays the arbiter either way. */
  def simhashPairs(df: DataFrame, textCol: String = "text", maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist < 60,
      s"maxDist must be in [0, 60) for a 60-bit signature, got $maxDist " +
        "(at >= 60 every pair qualifies — that is a cross join, not a dedup)")
    val nBlocks = maxDist + 1
    val bounds = (0 to nBlocks).map(b => b * 60 / nBlocks)
    val sigs = simhashSigs(df, textCol)
    val blocked = sigs.select(col("doc_id"), col("sig"),
        explode(array((0 until nBlocks).map { b =>
          val off = bounds(b)
          val width = bounds(b + 1) - off
          struct(lit(b).as("blk"),
            shiftright(col("sig"), off).bitwiseAND(lit((1L << width) - 1)).as("key"))
        }: _*)).as("e"))
      .select(col("doc_id"), col("sig"), col("e.blk"), col("e.key"))
    val popcnt = (c: Column) => bit_count(c)
    blocked.as("x").join(blocked.as("y"),
        col("x.blk") === col("y.blk") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.sig").as("sa"), col("y.sig").as("sb"))
      .distinct()
      .withColumn("hamming", popcnt(col("sa").bitwiseXOR(col("sb"))))
      .filter(col("hamming") <= maxDist)
      .select(col("a"), col("b"), col("hamming"))
  }
}
