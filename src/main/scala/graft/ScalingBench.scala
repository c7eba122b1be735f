package graft

import graft.pipeline.KgPipeline
import graft.webtext.WebtextGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling-efficiency benchmark (BASELINE.md): runs the full KG pipeline
  * (extract → link → insert → canonicalize → triples) over a synthetic
  * webtext corpus at a given core count and reports triples/sec and
  * pages/sec. Run at local[8] and local[32] on the same input; the sandbox
  * proxy for the north rule's N vs 4N executors.
  *
  * Usage: runMain graft.ScalingBench <cores> <pages> [rounds]
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 32
    val pages = if (args.length > 1) args(1).toLong else 50000L
    val rounds = if (args.length > 2) args(2).toInt else 1
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ckpt = java.nio.file.Files.createTempDirectory(s"kgbench$cores").toString
    // corpus partition count tracks data size, not core count — identical
    // input and plan shape at every parallelism level
    val corpusParts = math.max(32, (pages / 2000L).toInt)
    val t0 = System.nanoTime()
    val corpus = WebtextGen.generate(spark, pages, corpusParts)
      .select(col("url"), graft.extract.HtmlExtract.extractBinary(col("html")).as("text"))
    val result = KgPipeline.run(spark, corpus, "text", KgPipeline.domainModels(),
      KgPipeline.PipelineConfig(rounds = rounds, maxCandidatesPerRound = 500,
        minMentionFreq = 2), ckpt)
    val nTriples = result.triples.count()
    val wallSec = (System.nanoTime() - t0) / 1e9
    val scored = result.lineage.agg(sum("scoredPairs")).head.getLong(0)
    println(f"""{"bench":"kg_pipeline","cores":$cores,"pages":$pages,"rounds":$rounds,""" +
      f""""wall_sec":$wallSec%.2f,"triples":$nTriples,""" +
      f""""triples_per_sec":${nTriples / wallSec}%.2f,""" +
      f""""pages_per_sec":${pages / wallSec}%.2f,"scored_pairs":$scored}""")
    spark.stop()
  }
}
