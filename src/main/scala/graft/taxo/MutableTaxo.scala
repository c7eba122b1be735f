package graft.taxo

import scala.collection.mutable
import scala.collection.mutable.{ArrayBuffer, LinkedHashMap}

/** Raised when an edge insertion would create a cycle.
  * Mirrors the reference's networkx.NetworkXError at
  * /root/reference/src/icon/core/taxonomy.py:95.
  */
final class CycleException(msg: String) extends RuntimeException(msg)

final class NodeNotFound(msg: String) extends RuntimeException(msg)

/** In-memory taxonomy DAG with the exact operator semantics of the reference
  * `Taxonomy` class (/root/reference/src/icon/core/taxonomy.py:16-801).
  *
  * Every edge (u, v) means "u subClassOf v" (u = child, v = parent).
  * Node id 0 is reserved for the root concept.
  *
  * This is the *broadcast snapshot* structure of the Spark engine: built once
  * per round on the driver, broadcast to executors, and treated as immutable
  * inside tasks. Insertion-ordered maps reproduce the reference's Python-dict
  * iteration order so traversal decisions are bit-compatible.
  *
  * All ids are Long (reference uses Python ints; FAISS forces int64 —
  * vector_index.py:45).
  */
class MutableTaxo extends Serializable {

  /** child -> (parent -> edge label). Reference `_succ` (parents direction). */
  val succ: LinkedHashMap[Long, LinkedHashMap[Long, String]] = LinkedHashMap.empty
  /** parent -> (child -> edge label). Reference `_pred` (children direction). */
  val pred: LinkedHashMap[Long, LinkedHashMap[Long, String]] = LinkedHashMap.empty
  /** node -> label (None allowed: add_edge auto-creates label-less endpoints). */
  val nodeLabel: LinkedHashMap[Long, Option[String]] = LinkedHashMap.empty
  /** extra node attributes (JSON-stringified values) for round-trip fidelity. */
  val nodeAttrs: LinkedHashMap[Long, mutable.LinkedHashMap[String, String]] = LinkedHashMap.empty

  def numberOfNodes: Int = nodeLabel.size
  def numberOfEdges: Int = succ.valuesIterator.map(_.size).sum
  def nodes: Seq[Long] = nodeLabel.keys.toSeq
  def containsNode(n: Long): Boolean = nodeLabel.contains(n)
  def containsEdge(u: Long, v: Long): Boolean = succ.get(u).exists(_.contains(v))

  /** Edges in (child, parent, label) form, node-insertion-major order
    * (matches networkx edge iteration: by _succ insertion order). */
  def edges: Seq[(Long, Long, String)] = {
    val out = ArrayBuffer.empty[(Long, Long, String)]
    for ((u, ps) <- succ; (v, l) <- ps) out += ((u, v, l))
    out.toSeq
  }

  /** taxonomy.py:39-63. Returns 0 inserted / 1 no-op / 2 attrs updated. */
  def addNode(n: Long, label: Option[String] = None,
              attrs: Seq[(String, String)] = Nil): Int = {
    if (!nodeLabel.contains(n)) {
      succ(n) = LinkedHashMap.empty
      pred(n) = LinkedHashMap.empty
      nodeLabel(n) = label
      if (attrs.nonEmpty) nodeAttrs(n) = mutable.LinkedHashMap(attrs: _*)
      0
    } else if (label.isDefined || attrs.nonEmpty) {
      if (label.isDefined) nodeLabel(n) = label
      if (attrs.nonEmpty) {
        val bag = nodeAttrs.getOrElseUpdate(n, mutable.LinkedHashMap.empty)
        attrs.foreach { case (k, v) => bag(k) = v }
      }
      2
    } else 1
  }

  private def ensureNode(n: Long): Unit =
    if (!nodeLabel.contains(n)) { succ(n) = LinkedHashMap.empty; pred(n) = LinkedHashMap.empty; nodeLabel(n) = None }

  /** taxonomy.py:65-101. Cycle-screened insert; auto-creates endpoints.
    * Returns 0 inserted / 1 already existed (label updated). */
  def addEdge(u: Long, v: Long, label: String): Int = {
    ensureNode(u); ensureNode(v)
    if (subsumes(u, v)) throw new CycleException(s"Edge ($u,$v) not added because it would cause a cycle")
    val ret = if (succ(u).contains(v)) 1 else 0
    succ(u)(v) = label
    pred(v)(u) = label
    ret
  }

  /** taxonomy.py:103-119. Cascades incident edges. */
  def removeNode(n: Long): Unit = {
    if (!nodeLabel.contains(n)) throw new NodeNotFound(s"The node $n is not in the taxonomy.")
    for (u <- succ(n).keys) pred(u).remove(n)
    for (u <- pred(n).keys) succ(u).remove(n)
    succ.remove(n); pred.remove(n); nodeLabel.remove(n); nodeAttrs.remove(n)
  }

  /** taxonomy.py:121-129. */
  def removeEdge(u: Long, v: Long): Unit = {
    val ok = succ.get(u).exists(_.remove(v).isDefined) && pred.get(v).exists(_.remove(u).isDefined)
    if (!ok) throw new NodeNotFound(s"The edge $u-$v not in graph.")
  }

  /** taxonomy.py:131-148. Direct parents, optionally restricted to edge labels. */
  def getParents(n: Long, labels: Option[Set[String]] = None): Seq[Long] = {
    val m = succ.getOrElse(n, throw new NodeNotFound(s"The node $n is not in the taxonomy."))
    labels match {
      case None => m.keys.toSeq
      case Some(ls) => m.iterator.filter { case (_, l) => ls.contains(l) }.map(_._1).toSeq
    }
  }

  /** taxonomy.py:150-165. */
  def getChildren(n: Long, labels: Option[Set[String]] = None): Seq[Long] = {
    val m = pred.getOrElse(n, throw new NodeNotFound(s"The node $n is not in the taxonomy."))
    labels match {
      case None => m.keys.toSeq
      case Some(ls) => m.iterator.filter { case (_, l) => ls.contains(l) }.map(_._1).toSeq
    }
  }

  private def bfs(start: Long, next: Long => Seq[Long]): Seq[Long] = {
    val queue = mutable.Queue(start)
    val visited = mutable.HashSet(start)
    val answer = ArrayBuffer.empty[Long]
    while (queue.nonEmpty) {
      val n = queue.dequeue()
      for (m <- next(n)) if (visited.add(m)) { answer += m; queue.enqueue(m) }
    }
    answer.toSeq
  }

  /** taxonomy.py:167-189. Excludes the start node. */
  def getAncestors(n: Long, labels: Option[Set[String]] = None): Seq[Long] =
    bfs(n, getParents(_, labels))

  /** taxonomy.py:191-211. */
  def getDescendants(n: Long, labels: Option[Set[String]] = None): Seq[Long] =
    bfs(n, getChildren(_, labels))

  private def bfsDepth(start: Long, maxDepth: Int, next: Long => Seq[Long]): Seq[Long] = {
    val queue = mutable.Queue((start, 0))
    val visited = mutable.HashSet(start)
    val answer = ArrayBuffer.empty[Long]
    while (queue.nonEmpty) {
      val (n, d) = queue.dequeue()
      if (d < maxDepth)
        for (m <- next(n)) if (visited.add(m)) { answer += m; queue.enqueue((m, d + 1)) }
    }
    answer.toSeq
  }

  /** taxonomy.py:213-231. */
  def getAncestorsByDepth(n: Long, maxDepth: Int = 1, labels: Option[Set[String]] = None): Seq[Long] =
    bfsDepth(n, maxDepth, getParents(_, labels))

  /** taxonomy.py:233-251. */
  def getDescendantsByDepth(n: Long, maxDepth: Int = 1, labels: Option[Set[String]] = None): Seq[Long] =
    bfsDepth(n, maxDepth, getChildren(_, labels))

  /** taxonomy.py:253-269. u == v or u is an ancestor of v (searches downward from u). */
  def subsumes(u: Long, v: Long, labels: Option[Set[String]] = None): Boolean = {
    if (u == v) return true
    val queue = mutable.Queue(u)
    val visited = mutable.HashSet(u)
    while (queue.nonEmpty) {
      val n = queue.dequeue()
      if (n == v) return true
      for (m <- getChildren(n, labels)) if (visited.add(m)) queue.enqueue(m)
    }
    false
  }

  /** taxonomy.py:271-280. */
  def getLabel(n: Long): String = nodeLabel(n).orNull

  /** taxonomy.py:282-293. Upserts via addNode. */
  def setLabel(n: Long, label: String): Unit = addNode(n, Some(label))

  /** taxonomy.py:295-302. */
  def getEdgeLabel(u: Long, v: Long): String = succ(u)(v)

  /** taxonomy.py:304-312. */
  def setEdgeLabel(u: Long, v: Long, label: String): Unit = addEdge(u, v, label)

  /** taxonomy.py:314-336. Antichain reduction. reverse=false keeps nodes that
    * subsume no other input node (most-specific); reverse=true keeps nodes
    * subsumed by none (most-general). Order-independent (see SURVEY.md G9);
    * we return survivors in input order (deterministic superset of the
    * reference's set semantics). */
  def reduceSubset(subset: Seq[Long], labels: Option[Set[String]] = None,
                   reverse: Boolean = false): Seq[Long] = {
    if (subset.isEmpty) return Seq.empty
    val distinct = subset.distinct
    // a singleton reduces to itself — skip the reachability walk entirely
    // (the commit stage calls this once per decision, and a full-graph BFS
    // per one-element sup set made commit O(candidates × |taxo|)). The
    // membership check keeps the walk's NodeNotFound parity for stale ids.
    if (distinct.sizeIs <= 1) {
      for (n <- distinct if !containsNode(n))
        throw new NodeNotFound(s"The node $n is not in the taxonomy.")
      return distinct
    }
    val current = mutable.LinkedHashSet(distinct: _*)
    val step: Long => Seq[Long] =
      if (reverse) getParents(_, labels) else getChildren(_, labels)
    // early-exit BFS: stop as soon as ANY still-current member is reached
    // (same answer as materializing the whole closure and testing exists —
    // the antichain reduction is order-independent, SURVEY.md G9)
    def reachesCurrent(start: Long): Boolean = {
      val queue = mutable.Queue(start)
      val visited = mutable.HashSet(start)
      while (queue.nonEmpty) {
        val n = queue.dequeue()
        for (m <- step(n)) if (visited.add(m)) {
          if (current.contains(m)) return true
          queue.enqueue(m)
        }
      }
      false
    }
    for (n <- distinct) {
      if (reachesCurrent(n)) current.remove(n)
    }
    current.toSeq
  }

  /** taxonomy.py:338-372. Least Common Ancestors via colour propagation.
    * Empty input => bottom nodes (no children). */
  def getLCA(nodes: Seq[Long], labels: Option[Set[String]] = None): Seq[Long] =
    commonFrontier(nodes, labels, up = true)

  /** taxonomy.py:374-408. Greatest Common Descendants (dual).
    * Empty input => top nodes (no parents). */
  def getGCD(nodes: Seq[Long], labels: Option[Set[String]] = None): Seq[Long] =
    commonFrontier(nodes, labels, up = false)

  /** Nodes with no children (empty-input LCA, taxonomy.py:353). */
  def bottomNodes: Seq[Long] = pred.iterator.collect { case (k, v) if v.isEmpty => k }.toSeq
  /** Nodes with no parents (empty-input GCD, taxonomy.py:389). */
  def topNodes: Seq[Long] = succ.iterator.collect { case (k, v) if v.isEmpty => k }.toSeq

  private def commonFrontier(input: Seq[Long], labels: Option[Set[String]], up: Boolean): Seq[Long] = {
    if (input.isEmpty) return if (up) bottomNodes else topNodes
    val nodeSet = input.distinct
    val n0 = nodeSet.size
    val queue = mutable.Queue[(Long, Set[Long])](nodeSet.map(n => (n, Set(n))): _*)
    val colours = mutable.HashMap[Long, Set[Long]](nodeSet.map(n => n -> Set(n)): _*)
    val common = ArrayBuffer.empty[Long]
    val step: Long => Seq[Long] = if (up) getParents(_, labels) else getChildren(_, labels)
    while (queue.nonEmpty) {
      val (n, newColours) = queue.dequeue()
      colours(n) = colours(n) union newColours
      if (colours(n).size == n0) {
        common += n
      } else {
        for (m <- step(n)) {
          colours.get(m) match {
            case Some(cm) if colours(n).subsetOf(cm) => // skip
            case Some(_) => queue.enqueue((m, colours(n)))
            case None =>
              colours(m) = colours(n)
              queue.enqueue((m, colours(n)))
          }
        }
      }
    }
    reduceSubset(common.toSeq.distinct, labels, reverse = !up)
  }

  /** taxonomy.py:410-458. Sub-taxonomy "above" base: lower bound = reduced
    * base, upper bound = LCA(base) (crop_top) optionally unioned with LCAs
    * under forced edge-label sets; strict keeps only nodes that subsume at
    * least one base node. BFS downward from top, skipping base-descendants. */
  def createInsertionSearchSpace(base: Seq[Long], cropTop: Boolean = true,
                                 forceLabels: Seq[Set[String]] = Nil,
                                 strict: Boolean = false,
                                 maxChildFanout: Int = Int.MaxValue): MutableTaxo = {
    if (base.isEmpty) {
      if (maxChildFanout == Int.MaxValue) return deepCopy()
      // capped scale path (IconConfig.maxChildFanout): a seedless candidate
      // gets the root set only — copying a million-node graph per candidate
      // is the degenerate case the cap exists for
      val sg = new MutableTaxo
      for (r <- getGCD(Nil)) sg.addNode(r, Option(getLabel(r)))
      return sg
    }
    val subgraph = new MutableTaxo
    val baseReduced = reduceSubset(base).toSet
    // cap support: children of an over-fanout node are restricted to the
    // paths that lead to the retrieval seeds (base ∪ its ancestors) — the
    // region crop_top was aiming at before a flat snapshot degenerated it
    val seedPaths: mutable.HashSet[Long] =
      if (maxChildFanout == Int.MaxValue) null
      else {
        val s = mutable.HashSet.empty[Long]
        for (b <- baseReduced) { s += b; s ++= getAncestors(b) }
        s
      }

    val top: Seq[Long] =
      if (!cropTop) getGCD(Nil)
      else if (forceLabels.nonEmpty) {
        var t = mutable.LinkedHashSet(getLCA(baseReduced.toSeq): _*)
        for (labels <- forceLabels) t ++= getLCA(baseReduced.toSeq, Some(labels))
        reduceSubset(t.toSeq, reverse = true)
      } else getLCA(baseReduced.toSeq)

    val baseDescendants = mutable.HashSet.empty[Long]
    for (b <- baseReduced) baseDescendants ++= getDescendants(b)
    val baseSubsumes = mutable.HashSet.empty[Long]
    if (strict) { for (b <- baseReduced) { baseSubsumes ++= getAncestors(b); baseSubsumes += b } }

    val queue = mutable.Queue(top: _*)
    // processed-guard: the reference BFS (taxonomy.py:444-458) re-enqueues
    // a node once per path reaching it — O(#paths) work, exponential on
    // stacked multi-parent diamonds. Its node/edge adds are idempotent, so
    // skipping re-expansion produces the identical subgraph in O(V+E).
    val processed = mutable.HashSet.empty[Long]
    while (queue.nonEmpty) {
      val node = queue.dequeue()
      if (processed.add(node)) {
      subgraph.addNode(node, Option(getLabel(node)))
      if (!baseReduced.contains(node)) {
        // over-fanout probe runs from the SEED side: enumerating a
        // million-child node's list per candidate is itself the quadratic
        // cost the cap exists to avoid. Sorted for determinism (seedPaths
        // is a hash set; expansion order feeds decision tie-breaks).
        val kidMap = pred.getOrElse(node, mutable.Map.empty[Long, String])
        val expand: Seq[Long] =
          if (seedPaths != null && kidMap.size > maxChildFanout)
            seedPaths.iterator.filter(kidMap.contains).toSeq.sorted
          else getChildren(node)
        for (sub <- expand) {
          if (!baseDescendants.contains(sub) && (!strict || baseSubsumes.contains(sub))) {
            subgraph.addEdge(sub, node, getEdgeLabel(sub, node))
            queue.enqueue(sub)
          }
        }
      }
      }
    }
    subgraph
  }

  /** taxonomy.py:460-482. Min distance from any top node. */
  def getDepth(node: Long): Int = {
    val topDepth = mutable.HashMap.empty[Long, Int]
    val queue = mutable.Queue((node, 0))
    val visited = mutable.HashSet(node)
    while (queue.nonEmpty) {
      val (n, d) = queue.dequeue()
      val parents = getParents(n)
      if (parents.nonEmpty) {
        for (p <- parents) if (visited.add(p)) queue.enqueue((p, d + 1))
      } else {
        topDepth(n) = math.min(topDepth.getOrElse(n, Int.MaxValue), d)
      }
    }
    topDepth.values.min
  }

  /** taxonomy.py:484-500. 2*depth(LCA)/(d1+d2); 0 when no LCA exists. */
  def wuPalmer(node1: Long, node2: Long): Double = {
    val lca = getLCA(Seq(node1, node2))
    if (lca.isEmpty) return 0.0
    val d1 = getDepth(node1); val d2 = getDepth(node2); val dl = getDepth(lca.head)
    2.0 * dl / (d1 + d2)
  }

  /** taxonomy.py:502-517 semantics (min distance from nearest top node), via
    * a convergent fixed-point loop instead of the reference's revisit-happy
    * BFS (identical values; see SURVEY.md G15). */
  def levels(): Map[Long, Int] = minPropagate(topNodes, getChildren(_, None))

  /** taxonomy.py:519-534. Min distance from nearest bottom node. */
  def reverseLevels(): Map[Long, Int] = minPropagate(bottomNodes, getParents(_, None))

  private def minPropagate(seeds: Seq[Long], next: Long => Seq[Long]): Map[Long, Int] = {
    val level = mutable.LinkedHashMap.empty[Long, Int]
    var frontier = seeds
    var d = 0
    while (frontier.nonEmpty) {
      val nextFrontier = ArrayBuffer.empty[Long]
      for (n <- frontier) {
        if (!level.contains(n) || level(n) > d) {
          level(n) = d
          nextFrontier ++= next(n)
        }
      }
      frontier = nextFrontier.toSeq
      d += 1
    }
    level.toMap
  }

  /** taxonomy.py:536-570. Sign conventions: positive top_level = at least
    * that far below a top node; negative = within |x| of a bottom node, etc. */
  def filterByLevel(topLevel: Int = 0, bottomLevel: Int = 0): Seq[Long] = {
    lazy val lv = levels()
    lazy val rlv = reverseLevels()
    def topCheck(n: Long): Boolean =
      if (topLevel > 0) lv(n) >= topLevel
      else if (topLevel < 0) rlv(n) <= -topLevel
      else true
    def bottomCheck(n: Long): Boolean =
      if (bottomLevel > 0) rlv(n) >= bottomLevel
      else if (bottomLevel < 0) lv(n) <= -bottomLevel
      else true
    nodes.filter(n => topCheck(n) && bottomCheck(n))
  }

  /** taxonomy.py:572-618. Level-window sub-taxonomy for category move; edges
    * kept only between consecutively-valid nodes (reference quirk preserved:
    * edges skip-connecting across invalid nodes are dropped, not contracted). */
  def createMoveSearchSpace(scopeTopLevel: Int = 0, scopeBottomLevel: Int = 0): MutableTaxo = {
    lazy val lv = levels()
    lazy val rlv = reverseLevels()
    def verifyTop(x: Long): Boolean =
      if (scopeTopLevel > 0) lv(x) >= scopeTopLevel
      else if (scopeTopLevel < 0) rlv(x) <= -scopeTopLevel
      else true
    def verifyBottom(x: Long): Boolean =
      if (scopeBottomLevel > 0) rlv(x) >= scopeBottomLevel
      else if (scopeBottomLevel < 0) lv(x) <= -scopeBottomLevel
      else true
    val subgraph = new MutableTaxo
    val queue = mutable.Queue[(Long, Long, Boolean)](topNodes.map(t => (t, -1L, false)): _*)
    // expand each node's children ONCE: entries are per-EDGE (a multi-
    // parent node is dequeued once per parent so every subgraph edge is
    // added), but re-expanding on every dequeue walks per-PATH —
    // exponential on diamond ladders. `valid` depends only on the node,
    // so the skipped re-expansions were pure duplicates; node and edge
    // first-occurrence order (= subgraph insertion order) is unchanged.
    val expanded = mutable.HashSet.empty[Long]
    while (queue.nonEmpty) {
      val (node, prev, prevValid) = queue.dequeue()
      val valid = verifyTop(node) && verifyBottom(node)
      if (valid) {
        subgraph.addNode(node, Option(getLabel(node)))
        if (prevValid) subgraph.addEdge(node, prev, getEdgeLabel(node, prev))
      }
      if (expanded.add(node))
        for (sub <- getChildren(node)) queue.enqueue((sub, node, valid))
    }
    subgraph
  }

  /** taxonomy.py:620-629. DAG transitive reduction preserving node/edge
    * attrs: edge (u,v) is redundant iff v is reachable from u via another
    * parent of u. */
  def transitiveReduction(): MutableTaxo = {
    val tr = new MutableTaxo
    for (n <- nodes) tr.addNode(n, nodeLabel(n), nodeAttrs.get(n).map(_.toSeq).getOrElse(Nil))
    // ancestors-or-self cache per node, computed lazily
    val ancCache = mutable.HashMap.empty[Long, Set[Long]]
    def ancOrSelf(n: Long): Set[Long] =
      ancCache.getOrElseUpdate(n, getAncestors(n).toSet + n)
    for (u <- nodes; (v, l) <- succ(u)) {
      val redundant = succ(u).keysIterator.exists(p => p != v && ancOrSelf(p).contains(v))
      if (!redundant) tr.addEdge(u, v, l)
    }
    tr
  }

  /** taxonomy.py:631-641. Resolve IRI `...#<int>` to a node id. */
  def linkIri(iri: String): Long = {
    val m = "#(\\d+)$".r.findFirstMatchIn(iri)
      .getOrElse(throw new NodeNotFound(s"No class id fragment in $iri"))
    val id = m.group(1).toLong
    if (containsNode(id)) id else throw new NodeNotFound(id.toString)
  }

  def deepCopy(): MutableTaxo = {
    val t = new MutableTaxo
    for (n <- nodes) t.addNode(n, nodeLabel(n), nodeAttrs.get(n).map(_.toSeq).getOrElse(Nil))
    for ((u, v, l) <- edges) { t.succ(u)(v) = l; t.pred(v)(u) = l } // skip cycle re-check on copy
    t
  }

  override def toString: String = s"MutableTaxo($numberOfNodes nodes, $numberOfEdges edges)"
}

object MutableTaxo {
  /** Build from explicit node/edge lists (cycle-screened, insertion order preserved). */
  def apply(nodes: Seq[(Long, String)], edges: Seq[(Long, Long, String)]): MutableTaxo = {
    val t = new MutableTaxo
    for ((id, label) <- nodes) t.addNode(id, Some(label))
    for ((u, v, l) <- edges) t.addEdge(u, v, l)
    t
  }
}
