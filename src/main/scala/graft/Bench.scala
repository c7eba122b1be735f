package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. */
object Bench {
  def main(args: Array[String]): Unit = {
    // the f-interpolator formats through the default locale: under e.g.
    // de_DE "%.3f" renders "1,234" and the JSON line becomes unparseable —
    // pin ROOT before any number is formatted
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // testdata is many ~1MB parquet files; default 128m bins collapse the
      // scan to ~8 partitions (BENCH/BASELINE.md §4.4) — repack for fan-out
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "512k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed bootstrap: session/codegen/parquet-codec init otherwise lands
    // entirely on the alphabetically-first query (~5 s on this microVM)
    spark.range(1).count()
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a throwing query must NOT read as a fast success (an early failure
      // spends ~0 s, "improving" the total) — keep the run going so one
      // broken query doesn't hide the other 32 timings, but surface the
      // failure in the JSON and the exit code
      val rows = try fn(spark, sfDir).count() catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1L
      }
      val sec = (System.nanoTime() - t0) / 1e9
      (name, sec, rows)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, r) if r < 0 => "\"" + k + "\"" }
    val failedJson =
      if (failed.isEmpty) "" else s""","failed":${failed.mkString("[", ",", "]")}"""
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs$failedJson,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
