package graft

import graft.ops.SimOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ANN recall harness — the Spark twin of the reference's kNN evaluation
  * (/root/reference/experiments/evaluation/knn_eval.ipynb cell 4: recall@k
  * over repeated query draws with a 95% CI). Sweeps (bits, bands) for
  * `SimOps.lshCosineTopK` against the exact `cosineTopK` baseline on the
  * embeddings table; the chosen q18 parameters (SparkEntry.AnnBits/AnnBands)
  * are justified by this sweep (results recorded in BENCH/BASELINE.md).
  *
  * Usage: runMain graft.RecallBench [sfDir|clustered] [k] [repeats]
  * Prints one JSON line per (bits, bands) config:
  *   {"bits":16,"bands":8,"k":5,"recall_mean":…,"recall_ci95":…,"sec":…}
  *
  * `clustered` replaces the parquet table with a deterministic planted-
  * cluster corpus (250 tight clusters × 100 points, 64-dim): the testdata
  * embeddings are near-uniform random — cell-partitioning methods' WORST
  * case, since a query's true neighbors scatter across cells — while real
  * encoder outputs cluster by topic, which is the case IVF exists for.
  * Running both modes separates "the implementation is wrong" from "the
  * data has no cell structure" (BENCH/BASELINE.md §9n).
  */
object RecallBench {
  /** Deterministic planted-cluster corpus: point = cluster center + eps ·
    * per-point jitter, every coordinate a pure hash of (cluster|id, dim) —
    * reproducible across runs/parallelism, no RNG state. */
  def clusteredCorpus(spark: SparkSession, nVec: Long, nClusters: Int,
                      dim: Int, eps: Float): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    def coord(seed: Long, j: Int): Float = {
      val h = graft.functions.VectorExprs.fmix64(seed * 1315423911L + j)
      ((h & 0xffffff).toFloat / 0x7fffff.toFloat) - 1.0f // [-1, 1]
    }
    spark.range(0, nVec, 1, 32).map { id =>
      val c = id % nClusters
      (id, Array.tabulate(dim)(j => coord(c, j) + eps * coord(~id, j)))
    }.toDF("vec_id", "embedding")
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // JSON output: '.' decimal separator regardless of host locale
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val k = if (args.length > 1) args(1).toInt else 5
    val repeats = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val emb = (if (sfDir == "clustered")
        clusteredCorpus(spark, 25000L, 250, 64, 0.15f)
      else spark.read.parquet(s"$sfDir/embeddings.parquet"))
      .select(col("vec_id"), col("embedding")).persist()
    val n = emb.count()

    // `repeats` disjoint deterministic query batches (vec_id mod buckets) —
    // the repeat axis of the reference's evaluation
    val batches = (0 until repeats).map(r => emb.filter(col("vec_id") % (repeats * 5) === r))

    // exact baseline per batch: Set[(query, neighbor)]
    val exact = batches.map(q =>
      SimOps.cosineTopK(emb, q, k).select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet)

    def sweep(label: String, fn: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val recalls = batches.zip(exact).map { case (q, ex) =>
        val got = fn(q).select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
        if (ex.isEmpty) 1.0 else ex.intersect(got).size.toDouble / ex.size
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val mean = recalls.sum / recalls.size
      val sd = math.sqrt(recalls.map(r => (r - mean) * (r - mean)).sum /
        math.max(1, recalls.size - 1))
      val ci = 1.96 * sd / math.sqrt(recalls.size)
      println(f"""{$label,"k":$k,"n":$n,"repeats":$repeats,""" +
        f""""recall_mean":$mean%.4f,"recall_ci95":$ci%.4f,"sec":$sec%.2f}""")
    }
    for ((bits, bands) <- Seq((8, 8), (16, 16), (16, 8), (32, 16), (32, 8), (64, 16)))
      sweep(s""""kind":"lsh","bits":$bits,"bands":$bands""",
        q => SimOps.lshCosineTopK(emb, q, k, bits, bands))
    for (nProbe <- Seq(1, 2, 4, 8))
      sweep(s""""kind":"ivf","nlist":32,"nprobe":$nProbe""",
        q => SimOps.ivfTopK(emb, q, k, nlist = 32, nProbe = nProbe))
    spark.stop()
  }
}
