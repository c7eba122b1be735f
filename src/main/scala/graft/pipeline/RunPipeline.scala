package graft.pipeline

import graft.webtext.WebtextGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CLI for the KG pipeline over the synthetic webtext corpus.
  *
  * Usage: runMain graft.pipeline.RunPipeline <ckptDir> <pages> <rounds> [cores]
  * Resumable: re-running with the same ckptDir continues after the last
  * round whose COMMIT marker exists (kill it mid-run and re-run to verify).
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    val ckpt = args(0)
    val pages = if (args.length > 1) args(1).toLong else 10000L
    val rounds = if (args.length > 2) args(2).toInt else 2
    val cores = if (args.length > 3) args(3) else "8"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      // the pipeline drives GraphOps fixpoints from driver-built frames in
      // the distributed-canonicalize path; see GraphOps session note
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = WebtextGen.generate(spark, pages, 16).select(col("url"), col("html"))
    println(s"[pipeline] resume point: round ${KgPipeline.lastCompleteRound(ckpt)}")
    val result = KgPipeline.run(spark, corpus, "html", KgPipeline.domainModels(),
      KgPipeline.PipelineConfig(rounds = rounds, maxCandidatesPerRound = 100,
        minMentionFreq = 2), ckpt, htmlInput = true)
    println(s"[pipeline] rounds run: ${result.roundsRun}; triples: ${result.triples.count()}")
    result.triples.orderBy("subj", "pred", "obj").show(10, truncate = false)
    spark.stop()
  }
}
