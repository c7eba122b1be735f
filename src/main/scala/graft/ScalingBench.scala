package graft

import graft.pipeline.KgPipeline
import graft.webtext.WebtextGen
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-efficiency benchmark (BASELINE.md): runs the full KG pipeline
  * (extract → link → insert → canonicalize → triples) over a stored
  * synthetic webtext corpus at several core counts and reports triples/sec
  * and pages/sec per level — the sandbox proxy for the north rule's N vs 4N
  * executors.
  *
  * All levels run inside ONE JVM (stop/rebuild the SparkSession per level,
  * warm-up pass first): this sandbox is a microVM where faulting in fresh
  * heap pages is slower than the compute itself, so per-level JVMs would
  * measure page-fault throughput, not the engine.
  *
  * Usage: runMain graft.ScalingBench <cores[,cores...]> <pages> [rounds] [job]
  * job = "pipeline" (default) — full KG pipeline over <pages> webtext pages;
  *       "dedup"              — the shuffle-heavy dedup family (exact /
  *                              MinHash-LSH / SimHash) over a generated
  *                              <pages>-document 50k-vocabulary corpus
  *                              with injected near/exact duplicates.
  */
object ScalingBench {

  /** Wall spent in attribution-only diagnostic passes during the current
    * leg (legs run sequentially) — subtracted from the leg timer. */
  private var diagNanos = 0L

  /** smallFiles: the sf testdata / dedup corpora are a handful of ~1-4MB
    * parquet files — without small scan bins the whole scan collapses to a
    * few partitions and caps parallelism. The multi-GB pipeline corpus is
    * the opposite: 4MB bins explode it into thousands of tasks and driver
    * scheduling becomes a serial term that grows with input (measured:
    * ~16 s of the 4-core/16-core gap at 32M pages) — it gets default
    * sizing. */
  private def session(cores: Int, smallFiles: Boolean): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val b2 = if (smallFiles)
      b.config("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
        .config("spark.sql.files.openCostInBytes", (512 * 1024).toString)
    else b
    b2.getOrCreate()
  }

  def main(args: Array[String]): Unit = {
    // pin ROOT: the f-interpolator goes through the default locale, and a
    // comma decimal separator breaks every JSON line this main prints
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val coreLevels = (if (args.nonEmpty) args(0) else "32,8").split(",").map(_.trim.toInt).toSeq
    val pages = if (args.length > 1) args(1).toLong else 500000L
    val rounds = if (args.length > 2) args(2).toInt else 1
    val job = if (args.length > 3) args(3) else "pipeline"

    // ~80k pages (~28 MB) per file: file COUNT is a serial planning cost
    // (driver-side listing + footer reads — measured ~16 s of the wall at
    // 16k files / 32M pages, flattening the 4-vs-16-core ratio); 64M pages
    // at 40k/file doubled the listing term, so files are sized to hold the
    // count at ~800 regardless of corpus scale
    val corpusParts = math.max(32, (pages / 80000L).toInt)
    val corpusPath = s"/tmp/kgbench_corpus_${pages}_p$corpusParts"
    locally {
      val s = session(32, smallFiles = job != "pipeline")
      s.sparkContext.setLogLevel("WARN")
      if (job == "pipeline" &&
        !java.nio.file.Files.exists(java.nio.file.Paths.get(s"$corpusPath/_SUCCESS")))
        WebtextGen.generate(s, pages, corpusParts).write.mode("overwrite").parquet(corpusPath)
      // warm-up: fault in heap + page cache + JIT with one full untimed run
      if (job == "pipeline") runOnce(s, corpusPath, rounds) else runDedup(s, pages)
      s.stop()
    }

    val results = coreLevels.map { cores =>
      val s = session(cores, smallFiles = job != "pipeline")
      s.sparkContext.setLogLevel("WARN")
      diagNanos = 0L
      val t0 = System.nanoTime()
      val nTriples = if (job == "pipeline") runOnce(s, corpusPath, rounds) else runDedup(s, pages)
      // exclude attribution-only diagnostic passes (GRAFT_MINHASH_SPLIT)
      // from the leg wall — they recompute earlier stages and would
      // inflate the family total the split exists to explain
      val wallSec = (System.nanoTime() - t0 - diagNanos) / 1e9
      s.stop()
      if (job == "pipeline")
        println(f"""{"bench":"kg_pipeline","cores":$cores,"pages":$pages,"rounds":$rounds,""" +
          f""""wall_sec":$wallSec%.2f,"triples":$nTriples,""" +
          f""""triples_per_sec":${nTriples / wallSec}%.2f,"pages_per_sec":${pages / wallSec}%.2f}""")
      else
        println(f"""{"bench":"dedup_family","cores":$cores,"docs":$pages,""" +
          f""""wall_sec":$wallSec%.2f,"docs_per_sec":${pages / wallSec}%.0f,"rows":$nTriples}""")
      (cores, wallSec, nTriples)
    }
    if (results.size >= 2) {
      // median wall per core level (per-leg variance on this microVM is
      // real — page cache, JIT — so a single-leg pairing misleads)
      def median(xs: Seq[Double]): Double = {
        val s = xs.sorted
        if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
      }
      val byCores = results.groupBy(_._1).view.mapValues(r => median(r.map(_._2))).toMap
      val lo = byCores.keys.min
      val hi = byCores.keys.max
      val speedup = byCores(lo) / byCores(hi)
      val eff = speedup / (hi.toDouble / lo)
      println(f"""{"scaling":{"cores_lo":$lo,"cores_hi":$hi,""" +
        f""""wall_lo_median":${byCores(lo)}%.2f,"wall_hi_median":${byCores(hi)}%.2f,""" +
        f""""speedup":$speedup%.3f,"efficiency":$eff%.3f}}""")
    }
  }

  /** Deterministic dedup-bench corpus: `n` documents of 100 words drawn
    * from a 50k-word vocabulary (so posting lists stay sparse — the sf
    * tables' 28-word vocabulary makes every 3-gram ultra-common and the
    * dedup job overhead-bound at any core count), with every 10th document
    * given a near-duplicate copy (same text + 5 extra words, Jaccard ≈
    * 0.95) and every 25th an exact copy. */
  private def dedupCorpus(spark: SparkSession, n: Long): DataFrame = {
    val path = s"/tmp/dedupbench_corpus_$n"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/_SUCCESS"))) {
      val base = spark.range(0, n, 1, 64).select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(100)),
          i => concat(lit("w"), pmod(xxhash64(col("id"), i), lit(50000))))).as("text"))
      val nearDups = base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 2000000000L).as("doc_id"),
          concat(col("text"), lit(" zq1 zq2 zq3 zq4 zq5")).as("text"))
      val exactDups = base.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 4000000000L).as("doc_id"), col("text"))
      base.union(nearDups).union(exactDups)
        .write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
  }

  /** The shuffle-heavy dedup family (exact / MinHash-LSH / SimHash — the
    * q12/q14/q15 shapes) over the generated corpus — the jobs whose scaling
    * at 100 TB is carried by the banding/posting-list plans. */
  private def runDedup(spark: SparkSession, nDocs: Long): Long = {
    import graft.ops.TextOps
    val docs = dedupCorpus(spark, nDocs)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      if (sys.env.contains("GRAFT_DEDUP_PHASES"))
        println(f"""{"dedup_phase":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      r
    }
    val exact = t("exact")(TextOps.exactDuplicates(docs).count())
    // diagnostic split of the minhash phase (signature scan vs banded
    // self-join vs full pairs-with-verification) — extra passes recompute
    // the earlier stages, so the split run is for attribution only, never
    // for the family total: their wall is accumulated into diagNanos and
    // subtracted from the leg timer in main
    if (sys.env.contains("GRAFT_MINHASH_SPLIT")) {
      val d0 = System.nanoTime()
      t("mh_sigs")(TextOps.minhashSignatures(docs, "text", 3, 128).count())
      t("mh_cands")(TextOps.minhashCandidates(docs, "text", 3, 128, 16).count())
      diagNanos += System.nanoTime() - d0
    }
    val mh = t("minhash")(TextOps.minhashPairs(docs, k = 3, numHashes = 128, bands = 16,
      threshold = 0.9).count())
    val sh = t("simhash")(TextOps.simhashPairs(docs, maxDist = 3).count())
    exact + mh + sh
  }

  private def runOnce(spark: SparkSession, corpusPath: String, rounds: Int): Long = {
    val ckpt = java.nio.file.Files.createTempDirectory("kgbench").toString
    val corpus = spark.read.parquet(corpusPath).select(col("url"), col("html"))
    val result = KgPipeline.run(spark, corpus, "html", KgPipeline.domainModels(),
      KgPipeline.PipelineConfig(rounds = rounds, maxCandidatesPerRound = 500,
        minMentionFreq = 2), ckpt, htmlInput = true)
    result.triples.count()
  }
}
