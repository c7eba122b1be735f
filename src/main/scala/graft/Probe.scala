package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway decomposition probe for the optimization round (not part of
  * the driver contract; deleted or inert at round end). */
object Probe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "512k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1).count()
    spark.read.parquet(s"$sfDir/nation.parquet").count()

    def time(name: String, reps: Int = 3)(f: => Long): Unit = {
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[probe] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n)")
      }
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val st = docs.select(col("doc_id"),
        graft.functions.VectorExprs.wordShingleHashes(col("text"), 3).as("shs"))
      .withColumn("set_size", size(col("shs")))
      .select(col("doc_id"), col("set_size"), explode(col("shs")).as("sh"))
    time("shingle_rows")(st.count())
    val posting = st.groupBy("sh")
      .agg(collect_list(struct(col("doc_id"), col("set_size"))).as("ps"))
      .filter(size(col("ps")) >= 2)
    time("posting_lists")(posting.count())
    time("pair_rows") {
      posting
        .select(explode(col("ps")).as("x"), col("ps"))
        .select(col("x.doc_id").as("a"), col("x.set_size").as("sa"), explode(col("ps")).as("y"))
        .filter(col("a") < col("y.doc_id"))
        .count()
    }
    time("pair_agg") {
      posting
        .select(explode(col("ps")).as("x"), col("ps"))
        .select(col("x.doc_id").as("a"), col("x.set_size").as("sa"), explode(col("ps")).as("y"))
        .filter(col("a") < col("y.doc_id"))
        .groupBy(col("a"), col("y.doc_id").as("b"), col("sa"), col("y.set_size").as("sb"))
        .agg(count("*").as("inter"))
        .count()
    }
    spark.stop()
  }
}
