package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Embedding-similarity operators over `embeddings(vec_id LONG,
  * embedding ARRAY<FLOAT>, ...)` — brute-force exact top-k as the
  * correctness baseline (the reference always searches exhaustively,
  * vector_index.py:78-79) and a random-hyperplane-LSH bucketed variant as
  * the 100 TB scale path.
  *
  * Dot products are built-in higher-order functions (`aggregate(zip_with)`)
  * — codegen'd, no UDF (SURVEY.md R7).
  */
object SimOps {

  /** Inner product of two float-array columns in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

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

  /** Random-hyperplane signature: bit b = sign of dot(v, h_b) where h_b is a
    * deterministic FNV-derived ±1 hyperplane. Hyperplanes are materialized
    * as array literals (constant-folded, no per-row hashing). `dim` must
    * match the embedding width. */
  def rhpSignature(v: Column, bits: Int, dim: Int = 64): Column = {
    val planes: Array[Column] = Array.tabulate(bits) { b =>
      lit(Array.tabulate(dim) { i =>
        if ((graft.lexical.Tokenset.fnv1a64(s"rhp:$b:$i") & 1L) == 1L) 1.0 else -1.0
      })
    }
    array(planes.map { h =>
      when(aggregate(zip_with(v, h, (x, s) => x.cast("double") * s),
        lit(0.0), (acc, x) => acc + x) >= 0, 1).otherwise(0)
    }: _*)
  }

  /** LSH-bucketed approximate top-k: block by hyperplane-signature bands,
    * exact-rerank within buckets. At 10^12 rows the band join replaces the
    * corpus×query product; recall is tuned by (bits, bands). */
  def lshCosineTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                    bits: Int = 16, bands: Int = 4): DataFrame = {
    require(bits % bands == 0)
    val rows = bits / bands
    def banded(df: DataFrame): DataFrame =
      df.select(col("vec_id"), col("embedding"), rhpSignature(col("embedding"), bits).as("sig"))
        .select(col("vec_id"), col("embedding"),
          posexplode(transform(sequence(lit(0), lit(bands - 1)),
            b => concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows))))))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val cb = banded(corpus)
    val qb = banded(queries)
    val cand = cb.as("c").join(qb.as("q"),
        col("c.band") === col("q.band") && col("c.bucket") === col("q.bucket") &&
          col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        col("q.embedding").as("qe"), col("c.embedding").as("ce"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.withColumn("cos", round(cosine(col("qe"), col("ce")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold) via
    * LSH blocking + exact verification. */
  def cosineNearDupPairs(df: DataFrame, threshold: Double = 0.95,
                         bits: Int = 16, bands: Int = 4): DataFrame = {
    require(bits % bands == 0)
    val rows = bits / bands
    val banded = df.select(col("vec_id"), col("embedding"),
        rhpSignature(col("embedding"), bits).as("sig"))
      .select(col("vec_id"), col("embedding"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
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
