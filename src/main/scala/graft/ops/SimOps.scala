package graft.ops

import graft.functions.VectorExprs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Embedding-similarity operators over `embeddings(vec_id LONG,
  * embedding ARRAY<FLOAT>, ...)` — brute-force exact top-k as the
  * correctness baseline (the reference always searches exhaustively,
  * vector_index.py:78-79) and a random-hyperplane-LSH bucketed variant as
  * the 100 TB scale path.
  *
  * Hot-path arithmetic (cosine, RHP signatures) runs through the compiled
  * kernels in [[graft.functions.VectorExprs]]: Spark's higher-order array
  * lambdas are interpreted, and the round-1 fold-based forms cost ~4k
  * interpreted expression nodes per row (BENCH/BASELINE.md §4.1). The
  * kernels keep the identical FP operation order, so outputs are unchanged.
  */
object SimOps {

  /** Inner product of two float-array columns in double precision (HOF
    * reference form — kept as the readable spec of what the compiled
    * kernel computes; not used on the hot path). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Exact cosine similarity — compiled kernel, float or double arrays. */
  def cosine(a: Column, b: Column): Column = VectorExprs.cosineSim(a, b)

  /** Exact top-k cosine neighbors for each query vector: broadcast the
    * (small) query side against the corpus, one shuffle for the per-query
    * window ranking. Ranks are deterministic (ties broken by neighbor id).
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus.as("c").join(broadcast(queries.as("q")),
        col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        round(cosine(col("q.embedding"), col("c.embedding")), 6).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** Random-hyperplane signature packed into a Long: bit b = sign of
    * dot(v - center, h_b) where h_b is a deterministic FNV-derived ±1
    * hyperplane. One compiled loop per row (VectorExprs.rhpSig). */
  def rhpSignature(v: Column, bits: Int, dim: Int = 64,
                   center: Seq[Double] = Nil, bitOffset: Int = 0): Column =
    VectorExprs.rhpSig(v, bits, dim, center, bitOffset)

  /** Per-dimension corpus mean, rounded to 6 dp so the DuckDB oracle can
    * rebuild the identical centering vector. One cheap aggregation pass;
    * the dim-sized result rides into the signature expression as literals.
    * RHP-LSH needs centered data: biased (e.g. all-positive) embeddings
    * give every hyperplane dot the same sign and collapse all vectors into
    * a couple of buckets. */
  def dimMeans(df: DataFrame, dim: Int = 64): Seq[Double] = {
    // try_element_at: vectors narrower than `dim` contribute nulls (ANSI
    // element_at would fail the whole job); all-null dims center at 0
    val row = df.select((0 until dim).map(i =>
      round(avg(expr(s"try_element_at(embedding, ${i + 1})").cast("double")), 6).as(s"m$i")): _*)
      .head()
    (0 until dim).map(i => if (row.isNullAt(i)) 0.0 else row.getDouble(i))
  }

  /** (vec_id, band, bucket) blocking table from packed signatures: bucket =
    * the band's row bits, extracted with unsigned shifts (codegen'd — no
    * array slicing, no string buckets). */
  private def banded(df: DataFrame, bits: Int, bands: Int,
                     center: Seq[Double], dim: Int = 64): DataFrame = {
    val rows = bits / bands
    require(rows <= 64, s"rows per band must fit a long, got $rows")
    // the packed key tags the band at bit 48: with multiple bands, row
    // bits beyond 48 would alias into the tag (spurious cross-band
    // candidates) and the Long add could overflow under ANSI mode
    require(bands == 1 || rows <= 48,
      s"multi-band packing needs rows <= 48, got $rows (use bands = 1 for a single full-width band)")
    // signatures beyond 64 bits split across words; each word draws an
    // independent slice of the global plane family (bitOffset = absolute
    // plane index), and every band's row bits must lie within one word
    val nWords = (bits + 63) / 64
    require(nWords == 1 || 64 % rows == 0,
      s"multi-word banding needs rows dividing 64, got $rows")
    val mask = if (rows == 64) -1L else (1L << rows) - 1
    // dim must match the real embedding width: truncating a wide (e.g.
    // 768-dim) vector to the plane table's first 64 dims degenerates the
    // signature — sparse vectors with no mass in those dims all sign to
    // the same bucket and the candidate self-join goes quadratic (the
    // 768-dim pipeline rehearsal hit exactly this as a 30+ GB spill storm)
    val sigCols = (0 until nWords).map(w =>
      rhpSignature(col("embedding"), math.min(64, bits - w * 64), dim,
        center = center, bitOffset = w * 64).as(s"sig$w"))
    // (band, row-bits) packed into ONE long join key: band in the high
    // bits, bucket in the low — injective, so the candidate set is
    // identical to a (band, bucket) two-column join at less shuffle volume
    val bucketCols = (0 until bands).map { b =>
      val w = (b.toLong * rows) / 64
      val sh = ((b.toLong * rows) % 64).toInt
      (lit(b.toLong * (1L << 48)) +
        shiftrightunsigned(col(s"sig$w"), sh).bitwiseAND(lit(mask))).as(s"b$b")
    }
    df.select(col("vec_id") +: sigCols: _*)
      .select(col("vec_id"), explode(array(bucketCols: _*)).as("bucket"))
  }

  /** LSH-bucketed approximate top-k: block by hyperplane-signature bands,
    * exact-rerank within buckets. At 10^12 rows the band join replaces the
    * corpus×query product; recall is tuned by (bits, bands) — see the
    * RecallBench sweep in BENCH/BASELINE.md. Candidates are deduped on ids
    * only (cheap shuffle keys); vectors are re-joined for verification. */
  /** Vectors wider than the plane table lose the mass above `dim` from
    * their signatures — the degenerate-bucket failure documented at
    * banded(). Narrower is accepted with a precise semantics: a missing
    * dim contributes NOTHING to the plane dot — i.e. it reads as the
    * CENTER value, not as zero — identically in the column kernel
    * (RhpSigExpr) and the driver index (BandedIndex.signature), so the
    * twins always bucket narrow rows the same way. One take(1) probe per
    * entry call; plans untouched. This is the fast driver-side failure
    * only: a mixed-width frame whose first row happens to be narrow
    * passes it, so RhpSigExpr also guards EVERY row at eval time (same
    * error, surfaced through the task failure). */
  private def requireWidth(df: DataFrame, dim: Int): Unit =
    df.select(size(col("embedding"))).take(1).foreach { r =>
      require(r.getInt(0) <= dim,
        s"embeddings are ${r.getInt(0)}-dim but the LSH plane table is " +
          s"$dim-dim — pass dim explicitly (signatures would silently " +
          "ignore every dimension above the table width)")
    }

  def lshCosineTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                    bits: Int = 16, bands: Int = 8, dim: Int = 64): DataFrame = {
    require(bits % bands == 0)
    requireWidth(corpus, dim)
    requireWidth(queries, dim) // queries band through the same plane table
    // corpus statistics center BOTH sides (queries must band identically)
    val mu = dimMeans(corpus, dim)
    val cand = banded(corpus, bits, bands, mu, dim).as("c")
      .join(broadcast(banded(queries, bits, bands, mu, dim)).as("q"),
        col("c.bucket") === col("q.bucket") &&
          col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"))
      .distinct()
    val qv = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val cv = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.join(broadcast(qv), Seq("query_id"))
      .join(cv, Seq("neighbor_id"))
      .withColumn("cos", round(cosine(col("qe"), col("ce")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** IVF-style approximate top-k — the second scale path beside LSH:
    * centroids are a deterministic corpus sample (every ⌊n/nlist⌋-th
    * vec_id, lowest nlist ids — reproducible by the SQL oracle), each
    * corpus vector is assigned to its nearest centroid (one compiled
    * projection, no shuffle), queries probe their nProbe nearest cells and
    * exact-rerank inside them. At 10^12 rows the cell join replaces the
    * corpus×query product and the assignment column doubles as the
    * bucketed-layout key a real deployment would partition by. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 32, nProbe: Int = 4): DataFrame = {
    val n = corpus.count()
    val step = math.max(1L, n / nlist)
    val centRows = corpus.filter(col("vec_id") % step === 0)
      .orderBy("vec_id").limit(nlist)
      .select(col("vec_id"), col("embedding")).collect()
    val ids = centRows.map(_.getLong(0)).toSeq
    val cents = centRows.map(_.getSeq[Any](1).map {
      case f: Float => f.toDouble
      case d: Double => d
    }.toSeq).toSeq
    def nearest(v: Column, p: Int) =
      graft.functions.VectorExprs.nearestCentroids(v, ids, cents, p)
    val assign = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ce"), element_at(nearest(col("embedding"), 1), 1).as("cell"))
    val probes = queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qe"), explode(nearest(col("embedding"), nProbe)).as("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    assign.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosine(col("qe"), col("ce")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold) via
    * LSH blocking + exact verification. */
  def cosineNearDupPairs(df: DataFrame, threshold: Double = 0.95,
                         bits: Int = 16, bands: Int = 4, dim: Int = 64): DataFrame = {
    require(bits % bands == 0)
    requireWidth(df, dim)
    val b = banded(df, bits, bands, dimMeans(df, dim), dim)
    // SHUFFLE_HASH (guide §3.1): banded rows are 16-byte (vec_id, bucket)
    // pairs — per-partition hash build is compact and skips the two full
    // sorts a sort-merge join pays on the exploded table
    val cand = b.as("x").hint("SHUFFLE_HASH").join(b.as("y"),
        col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      .distinct() // dedupe on ids before re-joining vectors (cheap shuffle keys)
    val vecs = df.select(col("vec_id"), col("embedding"))
    cand
      .join(vecs.select(col("vec_id").as("a"), col("embedding").as("ea")), Seq("a"))
      .join(vecs.select(col("vec_id").as("b"), col("embedding").as("eb")), Seq("b"))
      .withColumn("cos", round(cosine(col("ea"), col("eb")), 6))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cos"))
  }
}
