package graft

import graft.spark.GraphOps
import graft.taxo.TaxoJson
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** `taxo` CLI (S4, /root/reference/src/icon/cli/main.py:18-98):
  *   view <taxo.json>       — node/edge/leaf/root counts + shallow tree
  *   validate <taxo.json>   — DAG check, missing labels, orphans
  *   convert <in> <out>     — JSON round-trip (normalizes + root synthesis)
  * Validation is expressed as Catalyst queries over the (nodes, edges)
  * DataFrames so it scales to taxonomies that don't fit the driver.
  */
object Cli {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Cli <view|validate|convert> <taxo.json> [out.json]")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try args(0) match {
      case "view" =>
        val (nodes, edges) = TaxoJson.loadDF(spark, args(1))
        println(s"nodes: ${nodes.count()}")
        println(s"edges: ${edges.count()}")
        println(s"roots: ${GraphOps.roots(nodes, edges).count()}")
        println(s"leaves: ${GraphOps.leaves(nodes, edges).count()}")
        val depths = GraphOps.depths(nodes, edges)
        println(s"max depth: ${depths.agg(max("depth")).head.get(0)}")
      case "validate" =>
        val (nodes, edges) = TaxoJson.loadDF(spark, args(1))
        var ok = true
        // 1. labels present
        val unlabeled = nodes.filter(col("label").isNull || col("label") === "").count()
        if (unlabeled > 0) { ok = false; println(s"INVALID: $unlabeled nodes without label") }
        // 2. orphans: nodes with no edges at all (and not the root)
        val touched = edges.select(col("src").as("id")).union(edges.select(col("dst").as("id"))).distinct()
        val orphans = nodes.join(touched, Seq("id"), "left_anti").filter(col("id") =!= 0L).count()
        if (orphans > 0) { ok = false; println(s"WARNING: $orphans orphan nodes") }
        // 3. acyclicity: iterative leaf-stripping; leftover nodes => cycle
        var remaining = edges.select("src", "dst").distinct().localCheckpoint(true)
        var n = remaining.count()
        var changed = true
        while (changed && n > 0) {
          // drop edges whose child has no incoming edge (is nobody's parent)
          val parents = remaining.select(col("dst").as("p")).distinct()
          val next = remaining.join(parents, remaining("src") === col("p"), "left_semi")
            .localCheckpoint(true)
          val m = next.count()
          changed = m != n
          remaining = next
          n = m
        }
        if (n > 0) { ok = false; println(s"INVALID: cycle detected ($n edges in cyclic core)") }
        println(if (ok) "VALID" else "validation failed")
        if (!ok) sys.exit(1)
      case "convert" =>
        val taxo = TaxoJson.load(args(1))
        TaxoJson.write(taxo, args(2))
        println(s"wrote ${args(2)}: $taxo")
      case other => sys.error(s"unknown command: $other")
    } finally spark.stop()
  }
}
