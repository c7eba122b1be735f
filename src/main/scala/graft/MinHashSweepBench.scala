package graft

import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MinHash banding sweep — justifies the production (numHashes, bands)
  * default the same way RecallBench justifies q18's ANN parameters
  * (BENCH/BASELINE.md §7): for each config, measure banding recall at the
  * production threshold 0.8 and the candidate-pair rate (the cost driver —
  * every candidate is an exact-Jaccard verification join row).
  *
  * The corpus is the 50k-vocabulary dedup shape with GRADED similarity
  * tiers: every 5th document gets a variant sharing its first m words,
  * m cycling over {98, 95, 90, 70, 50} → 3-gram Jaccard ≈
  * {0.96, 0.90, 0.82, 0.53, 0.32}. Only the first three tiers are true
  * pairs at threshold 0.8; the 0.53/0.32 tiers exist to expose the
  * candidate-rate cost of unselective bandings (rows = 1 admits nearly
  * everything mildly similar — the q14 oracle setting, which this sweep
  * shows is NOT the production default).
  *
  * Recall here = |minhashPairs output| / |jaccardPairs truth|: verification
  * is exact-Jaccard at the same threshold, so the verified set is a subset
  * of the truth set and the ratio IS banding recall — no pair-set
  * collection needed.
  *
  * Usage: runMain graft.MinHashSweepBench [nDocs] [threshold]
  * Prints one JSON line per (numHashes, bands) config.
  */
object MinHashSweepBench {

  /** Deterministic graded-similarity corpus (xxhash64-derived words, no
    * RNG): `n` base docs of 100 words over a 50k vocabulary; every 5th doc
    * gets a variant keeping its first m words with the remaining 100-m
    * drawn fresh (disjoint seed space). */
  def sweepCorpus(spark: SparkSession, n: Long): DataFrame = {
    val base = spark.range(0, n, 1, 64).select(col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(1), lit(100)),
        i => concat(lit("w"), pmod(xxhash64(col("id"), i), lit(50000))))).as("text"))
    val tiers = Seq(98, 95, 90, 70, 50)
    // NB: the variant must REUSE the base text (slice of split), not
    // re-derive words from the id — Spark 4 lateral column aliases make a
    // later select item's col("doc_id") resolve to the re-aliased id in
    // the SAME list, silently shifting the hash seed. The fresh suffix is
    // "v"-prefixed, disjoint from every base "w" word by construction.
    val variants = tiers.zipWithIndex.map { case (m, t) =>
      base.filter(col("doc_id") % (5 * tiers.size) === (5 * t))
        .withColumn("vid", col("doc_id") + 2000000000L)
        .select(col("vid").as("doc_id"),
          concat_ws(" ",
            concat_ws(" ", slice(split(col("text"), " "), 1, m)),
            concat_ws(" ", transform(sequence(lit(1), lit(100 - m)),
              i => concat(lit("v"), pmod(xxhash64(col("vid"), i), lit(50000)))))
          ).as("text"))
    }
    variants.foldLeft(base)(_ union _)
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // JSON output: '.' decimal separator regardless of host locale
    val n = if (args.length > 0) args(0).toLong else 50000L
    val threshold = if (args.length > 1) args(1).toDouble else 0.8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = sweepCorpus(spark, n).persist()
    val nDocs = docs.count()
    // exact ground truth at the production threshold (the q13 plan).
    // jaccardPairs is only exact while no shingle's df exceeds its skew
    // guard (see its exactness contract) — verify that precondition on
    // THIS corpus so recall denominators are provably exact, instead of
    // assuming it
    val truthGuard = 10000
    val maxDf = docs.select(col("doc_id"),
        explode(graft.functions.VectorExprs.wordShingleHashes(col("text"), 3)).as("sh"))
      .groupBy("sh").count().agg(max("count")).head.getLong(0)
    require(maxDf <= truthGuard,
      s"sweep corpus has a shingle in $maxDf docs > maxShingleFreq=$truthGuard: " +
        "the jaccardPairs ground truth would undercount — raise the guard")
    val truth = TextOps.jaccardPairs(docs, k = 3, threshold = threshold,
      maxShingleFreq = truthGuard).count()
    println(f"""{"corpus_docs":$nDocs,"threshold":$threshold,"truth_pairs":$truth,"max_shingle_df":$maxDf}""")

    val configs = Seq((128, 128), (128, 64), (128, 32), (128, 16),
      (64, 64), (64, 32), (64, 16), (64, 8), (32, 16), (32, 8))
    for ((nh, b) <- configs) {
      val t0 = System.nanoTime()
      val cands = TextOps.minhashCandidates(docs, k = 3, numHashes = nh, bands = b).count()
      val tCand = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val found = TextOps.minhashPairs(docs, k = 3, numHashes = nh, bands = b,
        threshold = threshold).count()
      val tFull = (System.nanoTime() - t1) / 1e9
      val recall = if (truth == 0) 1.0 else found.toDouble / truth
      println(f"""{"numHashes":$nh,"bands":$b,"rows":${nh / b},""" +
        f""""candidates":$cands,"cand_per_doc":${cands.toDouble / nDocs}%.3f,""" +
        f""""found":$found,"recall":$recall%.4f,"cand_sec":$tCand%.2f,"full_sec":$tFull%.2f}""")
    }
    spark.stop()
  }
}
