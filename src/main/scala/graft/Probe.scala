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
    import spark.implicits._
    spark.range(1).count()

    def time(name: String, reps: Int = 5)(f: => Long): Unit = {
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[probe] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n)")
      }
    }

    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "ckprobe")
    val rows = (1 to 500).map(i => (i.toLong, i.toLong + 7, s"label_$i"))

    // current shape: 5 driver-Seq LocalRelation writes through a pool
    time("spark_5writes_pooled") {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8,
        (r: Runnable) => { val t = new Thread(r, "p"); t.setDaemon(true); t })
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      val fs = (1 to 5).map { k =>
        scala.concurrent.Future {
          rows.toDF("seq", "id", "label").coalesce(1)
            .write.mode("overwrite").parquet(s"$base/sp_$k")
        }
      }
      fs.foreach(f => scala.concurrent.Await.result(f, scala.concurrent.duration.Duration.Inf))
      pool.shutdown()
      5L
    }

    // candidate: direct parquet-mr writes on the driver
    import org.apache.parquet.schema.{MessageTypeParser}
    import org.apache.parquet.example.data.simple.SimpleGroup
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.hadoop.metadata.CompressionCodecName
    val schema = MessageTypeParser.parseMessageType(
      "message spark_schema { optional int64 seq; optional int64 id; optional binary label (STRING); }")
    time("parquetmr_5writes") {
      (1 to 5).foreach { k =>
        val dir = java.nio.file.Paths.get(s"$base/mr_$k")
        java.nio.file.Files.createDirectories(dir)
        val conf = new org.apache.hadoop.conf.Configuration(false)
        org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(schema, conf)
        val w = ExampleParquetWriter
          .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
            new org.apache.hadoop.fs.Path(s"$dir/part-00000.snappy.parquet"),
            new org.apache.hadoop.conf.Configuration()))
          .withConf(conf)
          .withCompressionCodec(CompressionCodecName.SNAPPY)
          .withWriteMode(org.apache.parquet.hadoop.ParquetFileWriter.Mode.OVERWRITE)
          .build()
        try rows.foreach { case (a, b, l) =>
          val g = new SimpleGroup(schema)
          g.add("seq", a); g.add("id", b); g.add("label", l)
          w.write(g)
        } finally w.close()
      }
      5L
    }
    // read-back parity: does Spark read the parquet-mr file identically?
    val a = spark.read.parquet(s"$base/sp_1").orderBy("seq").collect().toSeq
    val b = spark.read.parquet(s"$base/mr_1").orderBy("seq").collect().toSeq
    println(s"[probe] readback schema spark=${spark.read.parquet(s"$base/sp_1").schema}")
    println(s"[probe] readback schema mr   =${spark.read.parquet(s"$base/mr_1").schema}")
    println(s"[probe] rows equal: ${a == b} (${a.size} vs ${b.size})")
    spark.stop()
  }
}
