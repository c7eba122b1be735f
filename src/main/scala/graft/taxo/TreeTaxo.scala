package graft.taxo

import scala.collection.mutable

/** Tree-constrained taxonomy: max in-degree 1 plus a mandatory root.
  * Mirrors the reference `TreeTaxonomy` (/root/reference/src/icon/core/taxonomy.py:803-955).
  */
class TreeTaxo(rootId: Long = 0L) extends MutableTaxo {

  var root: Long = rootId

  /** taxonomy.py:829-850. Single-parent enforcement with optional overwrite. */
  def addEdgeTree(u: Long, v: Long, label: String, overwrite: Boolean = false): Int = {
    val existing = succ.get(u).map(_.keys.toSeq).getOrElse(Nil)
    if (existing.nonEmpty) {
      if (overwrite) existing.foreach(p => removeEdge(u, p))
      else throw new CycleException(
        s"Edge not added because it would cause multi-inheritance. Existing edge ($u, $existing)")
    }
    val ret = super.addEdge(u, v, label)
    if (u == root) root = v
    ret
  }

  /** taxonomy.py:852-858. Root protection. */
  override def removeNode(n: Long): Unit = {
    if (n == root) throw new CycleException("Root node cannot be removed")
    super.removeNode(n)
  }

  /** taxonomy.py:860-870. The unique parent, or None. */
  def getParent(n: Long): Option[Long] = {
    val m = succ.getOrElse(n, throw new NodeNotFound(s"The node $n is not in the taxonomy."))
    m.keys.headOption
  }

  /** taxonomy.py:872-883. Walk to root. */
  def getAncestorsTree(node: Long): Seq[Long] = {
    val answer = mutable.ArrayBuffer.empty[Long]
    var cur = node
    while (cur != root) {
      getParent(cur) match {
        case Some(p) => cur = p; answer += p
        case None => return answer.toSeq
      }
    }
    answer.toSeq
  }

  /** taxonomy.py:898-905. Other children of the parent. */
  def getSiblings(node: Long): Seq[Long] =
    getParent(node) match {
      case None => Seq.empty
      case Some(p) => getChildren(p).filterNot(_ == node)
    }

  /** taxonomy.py:941-947. */
  def getDepthTree(node: Long): Int = getAncestorsTree(node).size

  /** taxonomy.py:949-955. Path from root to node inclusive. */
  def getBreadcrumb(node: Long): Seq[Long] = getAncestorsTree(node).reverse :+ node

  /** taxonomy.py:907-916. Tree-specialized subsumption: walk up from v. */
  def subsumesTree(u: Long, v: Long, labels: Option[Set[String]] = None): Boolean = {
    var cur = v
    while (cur != u) {
      val p = getParents(cur, labels)
      if (p.isEmpty) return false
      cur = p.head
    }
    true
  }

  /** taxonomy.py:918-939. Tree LCA via colour propagation (at most one). */
  def getLCATree(nodes: Seq[Long]): Seq[Long] = {
    if (nodes.isEmpty) return bottomNodes
    val queue = scala.collection.mutable.Queue[(Long, Set[Long])](nodes.map(n => (n, Set(n))): _*)
    val colours = scala.collection.mutable.HashMap[Long, Set[Long]](nodes.map(n => n -> Set(n)): _*)
    val n0 = nodes.distinct.size
    while (queue.nonEmpty) {
      val (n, newColours) = queue.dequeue()
      colours(n) = colours.getOrElse(n, Set.empty) union newColours
      if (colours(n).size == n0) return Seq(n)
      getParent(n).foreach(p => queue.enqueue((p, colours(n))))
    }
    Seq.empty
  }
}

object TreeTaxo {
  /** taxonomy.py:810-827: coerce a taxonomy into a tree-rooted one; every
    * top node other than the root is attached under it with label `auto`.
    * Requires in-degree <= 1 (throws otherwise). */
  def fromTaxo(t: MutableTaxo, rootId: Long = 0L): TreeTaxo = {
    val tree = new TreeTaxo(rootId)
    for (n <- t.nodes) tree.addNode(n, t.nodeLabel(n), t.nodeAttrs.get(n).map(_.toSeq).getOrElse(Nil))
    for ((u, v, l) <- t.edges) tree.addEdgeTree(u, v, l)
    if (!tree.containsNode(rootId)) tree.addNode(rootId, Some("Root Concept"))
    for (top <- tree.topNodes if top != rootId) tree.addEdgeTree(top, rootId, "auto")
    tree.root = rootId
    tree
  }
}
