package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated extraction-phase scaling probe: parquet scan → HTML extract →
  * bigram explode → mention count. Usage: runMain graft.ExtractBench <cores> <path> */
object ExtractBench {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // JSON output: '.' decimal separator regardless of host locale
    val cores = args(0).toInt
    val path = if (args.length > 1) args(1) else "/tmp/kgbench_corpus_500000"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (512 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the page cache + JIT with an untimed pass
    spark.read.parquet(path).count()
    val t0 = System.nanoTime()
    val corpus = spark.read.parquet(path)
      .select(graft.extract.HtmlExtract.extractBinary(col("html")).as("text"))
    val n = graft.pipeline.KgPipeline.extractMentions(corpus, "text", 2L).count()
    val sec = (System.nanoTime() - t0) / 1e9
    val parts = spark.read.parquet(path).rdd.getNumPartitions
    println(f"""{"extract_bench":{"cores":$cores,"mentions":$n,"sec":$sec%.2f,"scan_partitions":$parts}}""")
    spark.stop()
  }
}
