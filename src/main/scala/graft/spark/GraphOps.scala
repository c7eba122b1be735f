package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed DataFrame graph algorithms over an edge table
  * `edges(src LONG, dst LONG)` where src = child and dst = parent
  * (subClassOf orientation, matching the reference Taxonomy.
  * /root/reference/src/icon/core/taxonomy.py:26).
  *
  * These are the at-scale twins of the broadcast-snapshot operators in
  * [[graft.taxo.MutableTaxo]]: same semantics, expressed as iterative
  * join/union/distinct fixpoints so they work when the graph itself is the
  * distributed axis (SURVEY.md §2.2). Iteration counts are bounded by graph
  * depth; every loop persists + localCheckpoints its frontier to cut lineage.
  *
  * Session note: when these fixpoints are driven from DRIVER-BUILT
  * DataFrames (`Seq.toDF`, as in tests or the pipeline's distributed
  * canonicalize path), Spark's constraint propagation can fail inside
  * `Union.rewriteConstraints` with `NoSuchElementException: key not found:
  * <attr>` — localCheckpointed plans carry origin constraints whose
  * attribute ids no longer resolve. Set
  * `spark.sql.constraintPropagation.enabled=false` in such sessions
  * (SparkSpecBase does); parquet-backed inputs are unaffected.
  */
object GraphOps {

  /** Transitive closure pairs (node, ancestor), excluding self-pairs —
    * distributed `get_ancestors` (G5, taxonomy.py:167-189). Iterative
    * frontier expansion: O(depth) shuffles, each a join on the frontier
    * (small) against the edge table — not closure×closure squaring, so the
    * shuffle volume stays proportional to the closure size.
    */
  def ancestorClosure(edges: DataFrame, maxIter: Int = 64): DataFrame = {
    // localCheckpoint (not just persist): the frontier unions below mix this
    // seed with checkpointed RDD-backed plans; leaving a LocalRelation-
    // shaped child under the Union trips constraint rewriting
    // (AttributeMap key-not-found) when the input is a driver-built table
    val e = edges.select(col("src").as("node"), col("dst").as("anc")).distinct()
      .localCheckpoint(true)
    var closure = e
    var frontier = e
    var i = 0
    var done = false
    while (i < maxIter && !done) {
      // extend the frontier one hop upward; eager localCheckpoint first so
      // the convergence probe is metadata-cheap instead of a second job
      val next = frontier.as("f")
        .join(e.as("e2"), col("f.anc") === col("e2.node"))
        .select(col("f.node").as("node"), col("e2.anc").as("anc"))
        .distinct()
        .join(closure, Seq("node", "anc"), "left_anti")
        .localCheckpoint(true)
      if (next.isEmpty) done = true
      else {
        closure = closure.union(next).localCheckpoint(true)
        frontier = next
      }
      i += 1
    }
    // no-silent-caps: a >maxIter-deep graph would otherwise return a
    // truncated closure and every downstream op (TR, LCA, reduceSubset,
    // search spaces) would be silently wrong on the deep tail
    require(done, s"ancestorClosure did not converge in $maxIter iterations " +
      "(graph deeper than maxIter) — raise maxIter")
    closure
  }

  /** Leaves = nodes never appearing as a parent (empty-input LCA,
    * taxonomy.py:353): anti-join of nodes vs edges.dst. Renamed join keys —
    * `nodes` is often derived from `edges`, so raw column references would
    * resolve ambiguously against the shared lineage. */
  def leaves(nodes: DataFrame, edges: DataFrame): DataFrame =
    nodes.join(edges.select(col("dst").as("__p")), col("id") === col("__p"), "left_anti")

  /** Roots / top nodes = nodes never appearing as a child (taxonomy.py:389). */
  def roots(nodes: DataFrame, edges: DataFrame): DataFrame =
    nodes.join(edges.select(col("src").as("__c")), col("id") === col("__c"), "left_anti")

  /** Per-node min distance from any root — distributed `annotate_levels`
    * (G13/G15, taxonomy.py:460-517): level-synchronous min propagation. */
  def depths(nodes: DataFrame, edges: DataFrame, maxIter: Int = 64): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint(true)
    var level = roots(nodes, edges).select(col("id"), lit(0).as("depth"))
      .localCheckpoint(true)
    var frontier = level
    var i = 0
    var done = false
    while (i < maxIter && !done) {
      val next = frontier.as("f")
        .join(e.as("e2"), col("f.id") === col("e2.dst"))
        .select(col("e2.src").as("id"), (col("f.depth") + 1).as("depth"))
        .groupBy(col("id")).agg(min("depth").as("depth"))
        // keep only improvements (new node or smaller depth)
        .join(level.withColumnRenamed("depth", "old"), Seq("id"), "left")
        .filter(col("old").isNull || col("depth") < col("old"))
        .select(col("id"), col("depth"))
        .localCheckpoint(true)
      if (next.isEmpty) done = true
      else {
        level = level.join(next.select(col("id")), Seq("id"), "left_anti")
          .union(next).localCheckpoint(true)
        frontier = next
      }
      i += 1
    }
    require(done, s"depths did not converge in $maxIter iterations " +
      "(graph deeper than maxIter) — raise maxIter")
    level
  }

  /** Distributed transitive reduction (G18, taxonomy.py:620-629): an edge
    * (u,v) is redundant iff a path u→…→v of length ≥ 2 exists, i.e. some
    * other parent p of u reaches v through the closure. */
  def transitiveReduction(edges: DataFrame): DataFrame = {
    val closure = ancestorClosure(edges)
    // 2+hop reachability: first hop through a parent, then closure-or-self
    val viaParent = edges.as("e1")
      .join(edges.as("e2"), col("e1.src") === col("e2.src") && col("e1.dst") =!= col("e2.dst"))
      .select(col("e1.src").as("src"), col("e1.dst").as("dst"), col("e2.dst").as("mid"))
    val redundant = viaParent
      .join(closure, viaParent("mid") === closure("node") && viaParent("dst") === closure("anc"),
        "left_semi")
      .select(col("src"), col("dst")).distinct()
    edges.join(redundant, Seq("src", "dst"), "left_anti")
  }

  /** Distributed `reduce_subset` (G9, taxonomy.py:306-336): drop every
    * member that is an ancestor of another member (forward; keeps the most
    * specific), or a descendant (reverse=true; keeps the most general).
    * `subset` is a node table `(id)`. Pass a precomputed closure when
    * composing several of these ops to reuse the fixpoint. */
  def reduceSubset(edges: DataFrame, subset: DataFrame, reverse: Boolean = false,
                   closure0: Option[DataFrame] = None): DataFrame = {
    val closure = closure0.getOrElse(ancestorClosure(edges))
    // closure pairs with BOTH endpoints in the subset: anc is an ancestor
    // of node, so forward drops the anc side, reverse drops the node side
    val rel = closure
      .join(subset.select(col("id").as("node")), Seq("node"), "left_semi")
      .join(subset.select(col("id").as("anc")), Seq("anc"), "left_semi")
    val drop =
      if (reverse) rel.select(col("node").as("id")).distinct()
      else rel.select(col("anc").as("id")).distinct()
    subset.join(drop, Seq("id"), "left_anti")
  }

  /** Distributed `get_LCA` (G10, taxonomy.py:338-372): common ancestors =
    * nodes whose descendant-or-self set covers every query node, reduced to
    * the minimal ones. Empty query ⇒ leaves (reference semantics). One
    * aggregation over the closure instead of the driver's colour-BFS. */
  def lca(nodes: DataFrame, edges: DataFrame, query: DataFrame,
          closure0: Option[DataFrame] = None): DataFrame = {
    // localCheckpoint, not persist: eager (the count below reads the cached
    // RDD) and GC-reclaimed when the plan dies — persist() here leaked one
    // cache-manager entry per lca() call
    val q = query.select(col("id")).distinct().localCheckpoint(true)
    val n0 = q.count()
    if (n0 == 0) return leaves(nodes, edges)
    val closure = closure0.getOrElse(ancestorClosure(edges))
    val closureSelf = closure
      .union(q.select(col("id").as("node"), col("id").as("anc")))
    val ca = closureSelf
      .join(q.select(col("id").as("node")), Seq("node"), "left_semi")
      .groupBy(col("anc")).agg(countDistinct(col("node")).as("covered"))
      .filter(col("covered") === n0)
      .select(col("anc").as("id"))
    reduceSubset(edges, ca, reverse = false, closure0 = Some(closure))
  }

  /** Distributed `get_GCD` (G11 dual): common descendants reduced to the
    * maximal ones; empty query ⇒ roots. */
  def gcd(nodes: DataFrame, edges: DataFrame, query: DataFrame): DataFrame = {
    val q = query.select(col("id")).distinct()
    if (q.isEmpty) return roots(nodes, edges)
    val rev = edges.select(col("dst").as("src"), col("src").as("dst"))
    lca(nodes, rev, q)
  }

  /** Distributed `create_insertion_search_space` node set (G12,
    * taxonomy.py:410-458): everything reachable downward from the LCA of
    * the reduced base (or the roots when cropTop=false) without expanding
    * below a base node, excluding strict base-descendants, and — when
    * strict — keeping only nodes that subsume at least one base node.
    * `forceLabels` mirrors subgraph_force (taxonomy.py:424-429): the top
    * set is unioned with the base's LCAs computed over label-filtered edge
    * subsets (edges must then carry a `label` column), reduced to the most
    * general. Returns the node ids of the sub-taxonomy (the per-candidate
    * traversal itself stays executor-local against the broadcast snapshot —
    * this is the contingency for taxonomies beyond broadcast size,
    * SURVEY.md §2.2). */
  def insertionSearchSpaceNodes(nodes: DataFrame, edges: DataFrame, base: DataFrame,
                                cropTop: Boolean = true, strict: Boolean = false,
                                forceLabels: Seq[Set[String]] = Nil,
                                maxIter: Int = 64): DataFrame = {
    // empty base ⇒ the whole taxonomy (reference deepcopy(self),
    // taxonomy.py:422-423) — without this the lca() empty-query leaf
    // semantics would wrongly shrink the space to the leaves
    if (base.isEmpty) return nodes.select(col("id"))
    val closure = ancestorClosure(edges).persist(StorageLevel.MEMORY_AND_DISK)
    val baseR = reduceSubset(edges, base, reverse = false, closure0 = Some(closure))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val top =
      if (!cropTop) roots(nodes, edges)
      else if (forceLabels.nonEmpty) {
        val plain = lca(nodes, edges, baseR, closure0 = Some(closure))
        val forced = forceLabels.map { ls =>
          val fe = edges.filter(col("label").isin(ls.toSeq: _*))
          lca(nodes, fe, baseR)
        }
        val union = forced.foldLeft(plain.select(col("id")))(
          (acc, f) => acc.union(f.select(col("id")))).distinct()
        reduceSubset(edges, union, reverse = true, closure0 = Some(closure))
      } else lca(nodes, edges, baseR, closure0 = Some(closure))
    val baseDesc = closure
      .join(baseR.select(col("id").as("anc")), Seq("anc"), "left_semi")
      .select(col("node").as("id")).distinct()
    val allowed0 =
      if (!strict) nodes.select(col("id"))
      else closure // ancestors-or-self of base
        .join(baseR.select(col("id").as("node")), Seq("node"), "left_semi")
        .select(col("anc").as("id")).union(baseR.select(col("id"))).distinct()
    val allowed = allowed0.join(baseDesc, Seq("id"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val e = edges.select(col("src"), col("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var space = top.select(col("id")).distinct().localCheckpoint(true)
    var frontier = space
    var i = 0
    var done = false
    while (i < maxIter && !done) {
      val next = frontier
        // don't expand below a base node (reference line 271)
        .join(baseR, Seq("id"), "left_anti")
        .join(e, col("id") === col("dst"))
        .select(col("src").as("id")).distinct()
        .join(allowed, Seq("id"), "left_semi")
        .join(space, Seq("id"), "left_anti")
        .localCheckpoint(true)
      if (next.isEmpty) done = true
      else {
        space = space.union(next).localCheckpoint(true)
        frontier = next
      }
      i += 1
    }
    require(done, s"insertionSearchSpaceNodes did not converge in $maxIter " +
      "iterations (graph deeper than maxIter) — raise maxIter")
    // `space` is eagerly localCheckpointed every iteration, so by here it
    // is materialized and independent of these cached intermediates —
    // dropping them is free and keeps repeated calls from accumulating
    // dead blocks in executor storage (persist() is cache-manager-owned,
    // never GC-reclaimed, unlike the loop's RDD localCheckpoints)
    closure.unpersist(); baseR.unpersist(); allowed.unpersist(); e.unpersist()
    space
  }

  /** Connected components over an undirected edge set `(a, b)`: min-label
    * propagation with a pointer-jumping contraction each round (the
    * hash-to-min scheme — converges in O(log n) rounds on chains, no
    * GraphFrames/RDD dependency; SURVEY.md §4.3). Returns (node, component)
    * with component = min node id of the component. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    val sym = pairs.select(col("a").cast("long"), col("b").cast("long"))
      .union(pairs.select(col("b").cast("long").as("a"), col("a").cast("long").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = sym.groupBy(col("a").as("node"))
      .agg(least(min(col("b")), col("a")).as("comp"))
      .localCheckpoint(true)
    var i = 0
    var converged = false
    while (i < maxIter && !converged) {
      // propagate the min label across edges
      val viaEdges = sym.as("e")
        .join(labels.as("l"), col("e.b") === col("l.node"))
        .groupBy(col("e.a").as("node")).agg(min(col("l.comp")).as("nbrComp"))
      val prop = labels.join(viaEdges, Seq("node"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("nbrComp"), col("comp"))).as("comp"))
      // pointer jumping: comp(n) <- comp(comp(n))
      val jumped = prop.as("p")
        .join(prop.select(col("node").as("cnode"), col("comp").as("ccomp")).as("q"),
          col("p.comp") === col("q.cnode"), "left")
        .select(col("p.node").as("node"),
          least(col("p.comp"), coalesce(col("q.ccomp"), col("p.comp"))).as("comp"))
        .localCheckpoint(true)
      val changed = jumped.as("j")
        .join(labels.as("l"), col("j.node") === col("l.node"))
        .filter(col("j.comp") =!= col("l.comp"))
      converged = changed.isEmpty
      labels = jumped
      i += 1
    }
    sym.unpersist()
    require(converged, s"connectedComponents did not converge in $maxIter " +
      "pointer-jumping rounds — raise maxIter (silently-partial components " +
      "would merge wrong canonicalization clusters)")
    labels.select(col("node"), col("comp").as("component"))
  }

  /** Components including isolated nodes: every node maps to min(reachable). */
  def componentsWithIsolated(nodes: DataFrame, pairs: DataFrame): DataFrame = {
    val cc = connectedComponents(pairs)
    nodes.select(col("id").cast("long").as("node"))
      .join(cc, Seq("node"), "left")
      .select(col("node"), coalesce(col("component"), col("node")).as("component"))
  }
}
