package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sandbox calibration probe: pure-ALU codegen work (xxhash64 chain over
  * range) vs string-alloc work, at a given core count — separates the
  * machine's scaling ceiling from the engine's. */
object CpuProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // JSON output: '.' decimal separator regardless of host locale
    val cores = args(0).toInt
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm-up
    spark.range(0, 100000000L, 1, cores * 4)
      .select(sum(xxhash64(col("id")).bitwiseAND(lit(1048575L)))).head
    var t0 = System.nanoTime()
    spark.range(0, 4000000000L, 1, cores * 4)
      .select(sum(xxhash64(xxhash64(xxhash64(col("id")))).bitwiseAND(lit(1048575L)))).head
    val alu = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    spark.range(0, 20000000L, 1, cores * 4)
      .select(sum(length(sha2(concat(lit("x"), col("id").cast("string")), 256)))).head
    val str = (System.nanoTime() - t0) / 1e9
    println(f"""{"cpu_probe":{"cores":$cores,"alu_sec":$alu%.2f,"string_sec":$str%.2f}}""")
    spark.stop()
  }
}
