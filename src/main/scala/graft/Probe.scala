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

    def time(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[probe] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n)")
      }
    }

    val edges = graft.ops.TaxoQueries.edges(spark, sfDir)
    val nodes = graft.ops.TrainDataOps.labeledNodes(spark, sfDir)
    time("edges.count")(edges.count())
    time("closureCounted") {
      val (c, n) = graft.spark.GraphOps.ancestorClosureCounted(edges)
      n
    }
    time("closure.materialize") {
      val (c, _) = graft.spark.GraphOps.ancestorClosureCounted(edges)
      c.count()
    }
    time("positives") {
      val oneHop = edges.select(col("src").as("node"), col("dst").as("anc"))
      val twoHop = edges.as("e1").join(edges.as("e2"), col("e1.dst") === col("e2.src"))
        .select(col("e1.src").as("node"), col("e2.dst").as("anc"))
      oneHop.union(twoHop).distinct()
        .join(nodes.select(col("id").as("node"), col("label").as("subclass")), Seq("node"))
        .join(nodes.select(col("id").as("anc"), col("label").as("superclass")), Seq("anc"))
        .count()
    }
    time("full_q27")(graft.ops.TrainDataOps.subsData(spark, sfDir).count())

    time("full_q27_lck") {
      import graft.ops.TextOps
      import graft.spark.GraphOps
      val edgesM = edges.localCheckpoint()
      val nodesM = nodes.localCheckpoint()
      val nNodes = nodesM.count()
      val oneHop = edgesM.select(col("src").as("node"), col("dst").as("anc"))
      val twoHop = edgesM.as("e1").join(edgesM.as("e2"), col("e1.dst") === col("e2.src"))
        .select(col("e1.src").as("node"), col("e2.dst").as("anc"))
      val nodesH = (alias: String, as2: String) => GraphOps.hinted(
        nodesM.select(col("id").as(alias), col("label").as(as2)), nNodes)
      val positives = oneHop.union(twoHop).distinct()
        .join(nodesH("node", "subclass"), Seq("node"))
        .join(nodesH("anc", "superclass"), Seq("anc"))
        .select(col("subclass"), col("superclass"), lit(1L).as("labels"),
          col("node"), col("anc"))
      val (closure, nClosure) = GraphOps.ancestorClosureCounted(edgesM)
      val uppers = edgesM.select(col("dst").as("id")).distinct()
        .join(GraphOps.hinted(nodesM, nNodes), Seq("id"))
        .select(col("id").as("cand"), col("label").as("candLabel"))
        .orderBy(col("cand")).limit(10000)
      val closureR = closure.select(col("node").as("__cn"), col("anc").as("__ca"))
      val nonAnc = nodesM.select(col("id").as("node"))
        .crossJoin(broadcast(uppers.select(col("cand"))))
        .filter(col("node") =!= col("cand"))
        .join(GraphOps.hinted(closureR, nClosure),
          col("node") === col("__cn") && col("cand") === col("__ca"), "left_anti")
      val negatives = nonAnc
        .groupBy(col("node"))
        .agg(min(struct(
          TextOps.md5Long(concat(col("node").cast("string"), lit(":"), col("cand").cast("string"))).as("h"),
          col("cand").as("cand"))).as("m"))
        .select(col("node"), col("m.cand").as("cand"))
        .join(nodesH("node", "subclass"), Seq("node"))
        .join(broadcast(uppers), Seq("cand"))
        .select(col("subclass"), col("candLabel").as("superclass"), lit(0L).as("labels"),
          col("node"), col("cand").as("anc"))
      positives.union(negatives)
        .select(col("subclass"), col("superclass"), col("labels"), col("node"), col("anc"))
        .orderBy("node", "anc", "labels")
        .count()
    }
    spark.stop()
  }
}
