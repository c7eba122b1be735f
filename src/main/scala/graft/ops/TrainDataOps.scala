package graft.ops

import graft.spark.GraphOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-data builders (T1-T3, SURVEY.md §2.9) over the TPC-H-derived
  * taxonomy: the reference emits sub/gen/emb CSVs from a taxonomy
  * (experiments/data_wrangling/build_{sub,emb,gen}_data.py). The reference
  * samples negatives with np.random (not reproducible on the JVM); our
  * builders replace random draws with deterministic hash-ranked selection,
  * which the DuckDB oracle reproduces exactly.
  */
object TrainDataOps {

  /** Labeled node table for the region→nation→customer taxonomy. */
  def labeledNodes(spark: SparkSession, dir: String): DataFrame = {
    val nation = spark.read.parquet(s"$dir/nation.parquet")
    val region = spark.read.parquet(s"$dir/region.parquet")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    import spark.implicits._
    Seq((0L, "Root Concept")).toDF("id", "label")
      .union(region.select((col("r_regionkey").cast("long") + 1).as("id"), col("r_name").as("label")))
      .union(nation.select((col("n_nationkey").cast("long") + 100).as("id"), col("n_name").as("label")))
      .union(customer.select((col("c_custkey").cast("long") + 1000).as("id"), col("c_name").as("label")))
  }

  /** T1 subsumption pairs (build_sub_data.py:15-101): positives = all
    * (descendant ≤ 2 hops, ancestor) label pairs; negatives = per node, the
    * md5-hash-minimal upper-level non-ancestor. Columns follow the reference
    * CSV header (Subclass, Superclass, labels). */
  def subsData(spark: SparkSession, dir: String): DataFrame =
    subsDataFrom(TaxoQueries.edges(spark, dir), labeledNodes(spark, dir))

  /** Graph-shaped core of T1 so the builder works on ANY taxonomy edge/node
    * table, not just the fixture: the negative-candidate pool is the set of
    * INTERNAL nodes (every node some edge points to — the reference's
    * "upper levels"), derived from the graph itself rather than an id
    * convention (the previous `id < 1000` was a fixture-shape assumption).
    * The pool is explicitly bounded (`maxNegativePool`, id-ascending) —
    * it feeds a per-node cross join, so an unbounded pool is a scale
    * killer; 10⁴ uppers × broadcast keeps the join one broadcast-nested-
    * loop over the node table. */
  def subsDataFrom(edges: DataFrame, nodes: DataFrame,
                   maxNegativePool: Int = 10000): DataFrame = {
    // materialize both input tables ONCE (eager localCheckpoint): the
    // builder references edges 5× (one-hop, both two-hop sides, closure,
    // pool) and nodes 4× — each reference re-ran the full source subtree
    // (for the bench taxonomy, a 4-way parquet union scan) since scans,
    // unlike exchanges, are never reused. One pass each replaces ~9
    // re-scans; downstream joins against the now-RDD-backed (huge size
    // estimate) tables get adaptive broadcast hints from the EXACT counts
    // (GraphOps.hinted — plan choice from measured data, shuffle plans
    // beyond the limit).
    val edgesM = edges.localCheckpoint()
    val nodesM = nodes.localCheckpoint()
    val nNodes = nodesM.count()
    def nodesH(idAs: String, labelAs: String): DataFrame = GraphOps.hinted(
      nodesM.select(col("id").as(idAs), col("label").as(labelAs)), nNodes)
    val oneHop = edgesM.select(col("src").as("node"), col("dst").as("anc"))
    val twoHop = edgesM.as("e1").join(edgesM.as("e2"), col("e1.dst") === col("e2.src"))
      .select(col("e1.src").as("node"), col("e2.dst").as("anc"))
    val positives = oneHop.union(twoHop).distinct()
      .join(nodesH("node", "subclass"), Seq("node"))
      .join(nodesH("anc", "superclass"), Seq("anc"))
      .select(col("subclass"), col("superclass"), lit(1L).as("labels"),
        col("node"), col("anc"))
    // negatives: candidate pool = internal nodes (appear as an edge dst);
    // for each node pick the md5-minimal candidate that is NOT an ancestor
    val (closure, nClosure) = GraphOps.ancestorClosureCounted(edgesM)
    val uppers = edgesM.select(col("dst").as("id")).distinct()
      .join(GraphOps.hinted(nodesM, nNodes), Seq("id"))
      .select(col("id").as("cand"), col("label").as("candLabel"))
      .orderBy(col("cand")).limit(maxNegativePool)
    val closureR = closure.select(col("node").as("__cn"), col("anc").as("__ca"))
    // project early (guide §2.3): only (node, cand) id pairs flow through
    // the node×pool product, the closure anti-join, and the window shuffle
    // — the label strings rejoin AFTER the rn = 1 filter collapses the
    // product back to one row per node
    val nonAnc = nodesM.select(col("id").as("node"))
      .crossJoin(broadcast(uppers.select(col("cand")))) // bounded pool ⇒ broadcast-nested-loop, never a shuffle
      // adaptive broadcast of the closure (exact count from the fixpoint):
      // the RDD-backed closure otherwise size-estimates huge and this
      // anti-join shuffles the full node×pool product
      .filter(col("node") =!= col("cand"))
      .join(GraphOps.hinted(closureR, nClosure),
        col("node") === col("__cn") && col("cand") === col("__ca"), "left_anti")
    // md5-minimal candidate per node (ties by cand asc) as a lexicographic
    // struct-min aggregation: map-side partial agg collapses the node×pool
    // product to one row per node BEFORE the exchange, where the previous
    // row_number window shuffled and SORTED the whole product (guide §2.3:
    // aggregate before you shuffle). Identical row: min of (md5, cand) is
    // exactly rank-1 of ORDER BY md5 ASC, cand ASC.
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
  }

  /** T2 contrastive pairs (build_emb_data.py:15-101): clusters = children
    * sharing a parent; deterministic positive = the id-adjacent sibling. */
  def embData(spark: SparkSession, dir: String): DataFrame = {
    val edges = TaxoQueries.edges(spark, dir)
    val nodes = labeledNodes(spark, dir)
    val w = Window.partitionBy(col("dst")).orderBy(col("src"))
    edges.withColumn("sib", lag("src", 1).over(w))
      .filter(col("sib").isNotNull)
      .join(nodes.select(col("id").as("src"), col("label").as("query_label")), Seq("src"))
      .join(nodes.select(col("id").as("sib"), col("label").as("positive_label")), Seq("sib"))
      .select(col("query_label"), col("positive_label"),
        col("src").as("query_id"), col("sib").as("positive_id"))
      .orderBy("query_id", "positive_id")
  }

  /** T3 generation pairs (build_gen_data.py:11-150): per parent, the first
    * three children labels (sorted) as "summarize: a; b; c" with the parent
    * label as summary. */
  def genData(spark: SparkSession, dir: String): DataFrame = {
    val edges = TaxoQueries.edges(spark, dir)
    val nodes = labeledNodes(spark, dir)
    edges.join(nodes.select(col("id").as("src"), col("label").as("childLabel")), Seq("src"))
      .groupBy(col("dst"))
      .agg(slice(sort_array(collect_list(col("childLabel"))), 1, 3).as("kids"))
      .join(nodes.select(col("id").as("dst"), col("label").as("summary")), Seq("dst"))
      .select(concat(lit("summarize: "), concat_ws("; ", col("kids"))).as("text"),
        col("summary"), col("dst").as("parent_id"))
      .orderBy("parent_id")
  }
}
