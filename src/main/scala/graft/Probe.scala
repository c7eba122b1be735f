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
    def posting() = docs.select(col("doc_id"),
        graft.functions.VectorExprs.wordShingleHashes(col("text"), 3).as("shs"))
      .withColumn("set_size", size(col("shs")))
      .select(col("doc_id"), col("set_size"), explode(col("shs")).as("sh"))
      .groupBy("sh")
      .agg(collect_list(struct(col("doc_id"), col("set_size"))).as("ps"))
      .filter(size(col("ps")) >= 2)
    def finish(inter: org.apache.spark.sql.DataFrame) = inter
      .withColumn("uni", col("sa") + col("sb") - col("inter"))
      .withColumn("jaccard", round(col("inter").cast("double") / col("uni"), 6))
      .filter(col("jaccard") >= 0.12)
      .count()
    time("q13_asis") {
      finish(posting()
        .select(explode(col("ps")).as("x"), col("ps"))
        .select(col("x.doc_id").as("a"), col("x.set_size").as("sa"), explode(col("ps")).as("y"))
        .filter(col("a") < col("y.doc_id"))
        .groupBy(col("a"), col("y.doc_id").as("b"), col("sa"), col("y.set_size").as("sb"))
        .agg(count("*").as("inter")))
    }
    def banded() = docs.select(col("doc_id"),
        graft.functions.VectorExprs.minhashSig(col("text"), 3, 128).as("sig"))
      .withColumn("band", explode(sequence(lit(0), lit(127))))
      .withColumn("bucket",
        xxhash64(col("band"), slice(col("sig"), col("band") + 1, lit(1))))
      .select(col("doc_id"), col("bucket"))
    def interDF() = posting()
      .select(explode(col("ps")).as("x"), col("ps"))
      .select(col("x.doc_id").as("a"), col("x.set_size").as("sa"), explode(col("ps")).as("y"))
      .filter(col("a") < col("y.doc_id"))
      .groupBy(col("a"), col("y.doc_id").as("b"), col("sa"), col("y.set_size").as("sb"))
      .agg(count("*").as("inter"))
    def q14finish(cand: org.apache.spark.sql.DataFrame) =
      interDF().join(cand, Seq("a", "b"), "left_semi")
        .withColumn("uni", col("sa") + col("sb") - col("inter"))
        .withColumn("jaccard", round(col("inter").cast("double") / col("uni"), 6))
        .filter(col("jaccard") >= 0.12)
        .count()
    time("q14_distinct") {
      val b = banded()
      q14finish(b.as("x").hint("SHUFFLE_HASH").join(b.as("y"),
          col("x.bucket") === col("y.bucket") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .distinct())
    }
    time("q14_nodistinct") {
      val b = banded()
      q14finish(b.as("x").hint("SHUFFLE_HASH").join(b.as("y"),
          col("x.bucket") === col("y.bucket") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")))
    }
    spark.stop()
  }
}
