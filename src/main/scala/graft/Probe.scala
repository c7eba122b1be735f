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

    if (args.headOption.contains("gen-q33-sentinel")) {
      // one-off generator for src/main/resources/graft/q33-sentinel.parquet:
      // (event_id = -1, ts = 3000-01-01 NTZ micros, user_id = -1) with the
      // exact schema the dynamic staging write produces (TimestampNTZType,
      // INT64 TIMESTAMP(MICROS,false))
      val dir = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/tmp"), "q33gen").toString
      spark.range(1).select(lit(-1L).as("event_id"),
          lit("3000-01-01 00:00:00").cast(org.apache.spark.sql.types.TimestampNTZType).as("ts"),
          lit(-1L).as("user_id"))
        .coalesce(1).write.mode("overwrite").parquet(dir)
      val p = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
        .filter(x => x.getFileName.toString.endsWith(".parquet")).findFirst().get()
      val dest = java.nio.file.Paths.get("src/main/resources/graft/q33-sentinel.parquet")
      java.nio.file.Files.copy(p, dest,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      println(s"[probe] wrote $dest (${java.nio.file.Files.size(dest)} bytes)")
      println("[probe] read-back: " + spark.read.parquet(dest.toString).schema
        .map(f => s"${f.name}:${f.dataType}").mkString(", "))
      spark.read.parquet(dest.toString).show(false)
      spark.stop(); return
    }

    // what does Spark infer for the events ts column?
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    println("[probe] events schema: " + events.schema.map(f => s"${f.name}:${f.dataType}").mkString(", "))

    // current per-JVM q33 sentinel staging (agg job + one-row write)
    time("q33_sentinel_agg_write") {
      val dir = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "q33probe2").toString
      val sentinel = events.agg(max(col("ts")).as("ts")).select(lit(-1L).as("event_id"),
        (col("ts") + expr("INTERVAL 365 DAYS")).as("ts"), lit(-1L).as("user_id"))
      sentinel.coalesce(1).write.mode("overwrite").parquet(dir)
      1L
    }
    // what footer type does the Spark-written sentinel carry?
    val sdir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "q33probe3").toString
    events.agg(max(col("ts")).as("ts")).select(lit(-1L).as("event_id"),
        (col("ts") + expr("INTERVAL 365 DAYS")).as("ts"), lit(-1L).as("user_id"))
      .coalesce(1).write.mode("overwrite").parquet(sdir)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(sdir))
      .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
    val conf = spark.sparkContext.hadoopConfiguration
    def footerInfo(p: String): Unit = {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(p), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val md = r.getFooter.getFileMetaData
        println(s"[probe] footer $p schema: ${md.getSchema}")
        val blocks = r.getFooter.getBlocks
        val tsCols = blocks.get(0).getColumns
        (0 until tsCols.size()).foreach { i =>
          val c = tsCols.get(i)
          if (c.getPath.toDotString == "ts")
            println(s"[probe]   ts stats: type=${c.getPrimitiveType} max=${c.getStatistics.genericGetMax}")
        }
      } finally r.close()
    }
    footerInfo(part.toString)
    // driver-side footer stat read of the events table (the candidate
    // replacement for the agg job)
    time("footer_stat_read") {
      footerInfo(s"$sfDir/events.parquet")
      1L
    }
    // sentinel read-back: what does Spark infer from the sentinel file alone?
    println("[probe] sentinel schema: " + spark.read.parquet(sdir).schema
      .map(f => s"${f.name}:${f.dataType}").mkString(", "))
    spark.stop()
  }
}
