package graft

import graft.core.{ConfigLoader, IconConfig, IconEngine}
import graft.pipeline.KgPipeline
import graft.spark.GraphOps
import graft.taxo.{MutableTaxo, OwlReader, TaxoJson}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** `taxo` CLI (S4, /root/reference/src/icon/cli/main.py:18-114):
  *   view <taxo.{json,owl,rdf}> [--depth N] — stats + tree preview
  *   validate <taxo.{json,owl,rdf}>         — DAG, labels, orphans
  *   convert <in.{json,owl,rdf}> <out.json> — normalize to JSON
  *   enrich <taxo.{json,owl,rdf}> [--config cfg.json] [--mode m] [-o out]
  * Output fields mirror the reference (`Nodes :`, `OK: Taxonomy is
  * valid.` …). Validation is expressed as Catalyst queries over the
  * (nodes, edges) DataFrames so it scales to taxonomies that don't fit
  * the driver; view/enrich load a driver-side taxonomy (the reference's
  * preview/enrich are inherently traversal-shaped). `enrich` goes beyond
  * the reference scaffold (main.py:100-113 only prints a pointer to the
  * Python API): given --config it runs the engine with the built-in
  * deterministic domain models and writes the enriched taxonomy.
  */
object Cli {

  /** OWL/RDF vs JSON dispatch by extension (main.py:23-26). */
  def loadTaxo(path: String): MutableTaxo =
    if (path.endsWith(".owl") || path.endsWith(".rdf")) OwlReader.fromOwl(path)
    else TaxoJson.load(path)

  private def opt(args: Array[String], name: String): Option[String] = {
    val i = args.indexOf(name)
    if (i >= 0 && i + 1 < args.length) Some(args(i + 1)) else None
  }

  /** Depth-bounded tree preview with the reference's shared-visited-set
    * quirk (main.py:37-50): a multi-parent node prints under its first
    * encountered parent only. */
  def treePreview(taxo: MutableTaxo, depth: Int, out: String => Unit): Unit = {
    val visited = scala.collection.mutable.Set.empty[Long]
    def printTree(node: Long, indent: Int): Unit = {
      if (visited.contains(node) || indent > depth) return
      visited += node
      val label = Option(taxo.getLabel(node)).getOrElse(node.toString)
      out("  " * indent + label)
      for (child <- taxo.getChildren(node)) printTree(child, indent + 1)
    }
    out(s"Tree preview (depth <= $depth):")
    for (root <- taxo.getGCD(Seq.empty)) printTree(root, 0)
  }

  def main(args: Array[String]): Unit = {
    // every subcommand takes a file: demand it up front so `Cli view`
    // prints usage instead of a raw ArrayIndexOutOfBoundsException
    require(args.length >= 2,
      "usage: Cli <view|validate|convert|enrich> <taxo.{json,owl,rdf}> [options]")
    args(0) match {
      case "view" =>
        val taxo = loadTaxo(args(1))
        val depth = opt(args, "--depth").map(_.toInt).getOrElse(3)
        println(s"Nodes : ${taxo.nodes.size}")
        println(s"Edges : ${taxo.edges.size}")
        println(s"Roots : ${taxo.getGCD(Seq.empty).size}")
        println(s"Leaves: ${taxo.getLCA(Seq.empty).size}")
        println()
        treePreview(taxo, depth, println)
      case "validate" =>
        val ok = withSpark { spark =>
          val (nodes, edges) =
            if (args(1).endsWith(".owl") || args(1).endsWith(".rdf")) {
              import spark.implicits._
              val t = loadTaxo(args(1))
              (t.nodes.toSeq.map(n => (n, t.getLabel(n))).toDF("id", "label"),
                t.edges.map { case (u, v, l) => (u, v, l) }.toDF("src", "dst", "label"))
            } else TaxoJson.loadDF(spark, args(1))
          runValidate(nodes, edges, println)
        }
        if (!ok) sys.exit(1)
      case "convert" =>
        require(args.length >= 3, "usage: Cli convert <in> <out.json>")
        if (!args(2).endsWith(".json")) {
          System.err.println("Only JSON output is currently supported.")
          sys.exit(1)
        }
        val taxo = loadTaxo(args(1))
        TaxoJson.write(taxo, args(2))
        println(s"Saved JSON taxonomy to ${args(2)}")
      case "enrich" =>
        val taxoFile = args(1)
        val out = opt(args, "-o").orElse(opt(args, "--output"))
          .getOrElse(taxoFile.replaceAll("\\.(json|owl|rdf)$", "") + ".enriched.json")
        opt(args, "--config") match {
          case None =>
            // reference scaffold behavior (main.py:100-113)
            println("ICON enrich requires a config artifact; pass --config <cfg.json>.")
            println("Config leaf names follow the reference config tree (config.py).")
          case Some(cfgPath) =>
            var cfg = ConfigLoader.iconFromFile(cfgPath)
            opt(args, "--mode").foreach(m => cfg = cfg.copy(mode = m))
            val taxo = loadTaxo(taxoFile)
            val engine = new IconEngine(KgPipeline.domainModels(), cfg)
            val enriched = engine.run(taxo)
            TaxoJson.write(enriched, out)
            println(s"Enriched taxonomy written to $out " +
              s"(nodes ${taxo.nodes.size} -> ${enriched.nodes.size})")
        }
      case other => sys.error(s"unknown command: $other")
    }
  }

  /** Validation body (testable without sys.exit): DAG + labels + orphans as
    * Catalyst queries over (nodes, edges) — scales past driver-sized
    * taxonomies. Mirrors the reference checks and their semantics exactly
    * (main.py:81-98): messages accumulate in an error list in reference
    * order (cycles, labels, orphans); ANY entry — including the orphan
    * WARN — suppresses the OK line and exits nonzero. */
  def runValidate(nodes: org.apache.spark.sql.DataFrame,
                  edges: org.apache.spark.sql.DataFrame,
                  out: String => Unit): Boolean = {
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    // 1. acyclicity (main.py:82-83): iterative leaf-stripping; leftover
    // edges => cyclic core
    var remaining = edges.select("src", "dst").distinct().localCheckpoint(true)
    var n = remaining.count()
    var changed = true
    while (changed && n > 0) {
      val parents = remaining.select(col("dst").as("p")).distinct()
      val next = remaining.join(parents, remaining("src") === col("p"), "left_semi")
        .localCheckpoint(true)
      val m = next.count()
      changed = m != n
      remaining = next
      n = m
    }
    if (n > 0) errors += s"FAIL: Taxonomy contains cycles. ($n edges in cyclic core)"
    // 2. labels present (main.py:85-87)
    val unlabeled = nodes.filter(col("label").isNull || col("label") === "").count()
    if (unlabeled > 0) errors += s"FAIL: $unlabeled node(s) have no label"
    // 3. orphans: nodes with no edges at all, root exempt (main.py:89-91);
    // a WARN, but the reference still puts it in `errors` and exits 1
    val touched = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
    val orphans = nodes.join(touched, Seq("id"), "left_anti")
      .filter(col("id") =!= 0L).count()
    if (orphans > 0) errors += s"WARN: $orphans orphan node(s) found."
    if (errors.nonEmpty) { errors.foreach(out); false }
    else { out("OK: Taxonomy is valid."); true }
  }

  private def withSpark[A](f: SparkSession => A): A = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try f(spark) finally spark.stop()
  }
}
