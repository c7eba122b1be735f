package graft

import graft.pipeline.KgPipeline
import graft.webtext.WebtextGen
import org.apache.spark.sql.SparkSession
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
  * Usage: runMain graft.ScalingBench <cores[,cores...]> <pages> [rounds]
  */
object ScalingBench {

  private def session(cores: Int): SparkSession = SparkSession.builder()
    .master(s"local[$cores]")
    .appName(s"graft-scaling-$cores")
    .config("spark.sql.shuffle.partitions", cores.toString)
    .config("spark.sql.adaptive.enabled", "true")
    // the corpus is many ~1MB parquet files: with the default 128MB bin +
    // 4MB open-cost the scan collapses to ~8 partitions and caps effective
    // parallelism — size splits so the scan fans out to every thread
    .config("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
    .config("spark.sql.files.openCostInBytes", (512 * 1024).toString)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def main(args: Array[String]): Unit = {
    val coreLevels = (if (args.nonEmpty) args(0) else "32,8").split(",").map(_.trim.toInt).toSeq
    val pages = if (args.length > 1) args(1).toLong else 500000L
    val rounds = if (args.length > 2) args(2).toInt else 1

    val corpusPath = s"/tmp/kgbench_corpus_$pages"
    val corpusParts = math.max(32, (pages / 2000L).toInt)
    locally {
      val s = session(32)
      s.sparkContext.setLogLevel("WARN")
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$corpusPath/_SUCCESS")))
        WebtextGen.generate(s, pages, corpusParts).write.mode("overwrite").parquet(corpusPath)
      // warm-up: fault in heap + page cache + JIT with one full untimed run
      runOnce(s, corpusPath, rounds)
      s.stop()
    }

    val results = coreLevels.map { cores =>
      val s = session(cores)
      s.sparkContext.setLogLevel("WARN")
      val t0 = System.nanoTime()
      val nTriples = runOnce(s, corpusPath, rounds)
      val wallSec = (System.nanoTime() - t0) / 1e9
      s.stop()
      println(f"""{"bench":"kg_pipeline","cores":$cores,"pages":$pages,"rounds":$rounds,""" +
        f""""wall_sec":$wallSec%.2f,"triples":$nTriples,""" +
        f""""triples_per_sec":${nTriples / wallSec}%.2f,"pages_per_sec":${pages / wallSec}%.2f}""")
      (cores, wallSec, nTriples)
    }
    if (results.size >= 2) {
      val lo = results.minBy(_._1)
      val hi = results.maxBy(_._1)
      val speedup = lo._2 / hi._2
      val eff = speedup / (hi._1.toDouble / lo._1)
      println(f"""{"scaling":{"cores_lo":${lo._1},"cores_hi":${hi._1},""" +
        f""""wall_lo":${lo._2}%.2f,"wall_hi":${hi._2}%.2f,""" +
        f""""speedup":$speedup%.3f,"efficiency":$eff%.3f}}""")
    }
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
