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

    time("q33_staging") {
      val dir = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "q33probe").toString
      val events = spark.read.parquet(s"$sfDir/events.parquet")
        .select(col("event_id"), col("ts"), col("user_id"))
      val sentinel = events.agg(max(col("ts")).as("ts")).select(lit(-1L).as("event_id"),
        (col("ts") + expr("INTERVAL 365 DAYS")).as("ts"), lit(-1L).as("user_id"))
      events.union(sentinel).coalesce(1).write.mode("overwrite").parquet(dir)
      1L
    }
    time("q33_sentinel_only") {
      val dir = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "q33probe2").toString
      val events = spark.read.parquet(s"$sfDir/events.parquet")
      val sentinel = events.agg(max(col("ts")).as("ts")).select(lit(-1L).as("event_id"),
        (col("ts") + expr("INTERVAL 365 DAYS")).as("ts"), lit(-1L).as("user_id"))
      sentinel.coalesce(1).write.mode("overwrite").parquet(dir)
      1L
    }
    spark.stop()
  }
}
