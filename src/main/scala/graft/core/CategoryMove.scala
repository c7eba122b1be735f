package graft.core

import graft.models.IconModels
import graft.retrieve.VectorIndex
import graft.taxo.{CycleException, MutableTaxo}

import scala.collection.mutable
import scala.collection.mutable.{ArrayBuffer, LinkedHashMap}

/** Category-move (re-parenting) configuration — leaf names follow
  * /root/reference/src/icon/core/category_move.py:18-65. */
case class MoveConfig(
    mode: String = "auto", // auto | manual
    method: String = "search", // search | rag
    maxOuterLoop: Option[Int] = None,
    ignore: Set[Long] = Set.empty,
    inputConcepts: Seq[Long] = Nil,
    retrieveSize: Int = 10,
    candidateTopLevel: Int = -1,
    candidateBottomLevel: Int = 1,
    retIgnore: Set[Long] = Set.empty,
    scopeTopLevel: Int = 0,
    scopeBottomLevel: Int = 1,
    threshold: Double = 0.5,
    tolerance: Int = 0,
    forcePrune: Boolean = false,
    alwaysSearchToBottom: Boolean = true,
    doSelect: Boolean = true,
    alwaysIncludeOld: Boolean = true,
    selectionFeatures: Seq[String] = Seq("parent", "siblings"),
    weights: Seq[Double] = Seq(1.0, 1.0),
    doUpdate: Boolean = true) extends Serializable {
  require(threshold >= 0 && threshold <= 1)
}

/** The category-move application (C1-C9, category_move.py): re-parent leaf
  * concepts by one-directional search or retrieval, weighted feature
  * ranking, and `moved`-labelled edge commits. Driver-side sequential twin;
  * candidates within a batch are independent given the snapshot, so the
  * distributed variant fans examine-steps out exactly like KgPipeline.
  */
class CategoryMoveEngine(val models: IconModels, var config: MoveConfig) {

  var working: MutableTaxo = _
  val scoreCache: ScoreCache = new ScoreCache(models.sub)
  val logs: LinkedHashMap[Long, Seq[Long]] = LinkedHashMap.empty
  var kept: Long = 0L
  var moved: Long = 0L
  private var index: VectorIndex = _
  private val extraVecs = mutable.HashMap.empty[Long, Array[Float]]

  /** category_move.py:87-107: concept-or-string to unit vector (concept
    * vectors from the index, strings embedded on the fly). */
  def entityToUnitVector(e: Either[Long, String]): Array[Double] = {
    val v = e match {
      case Left(node) if index != null && index.contains(node) => index.reconstruct(node)
      case Left(node) =>
        extraVecs.getOrElseUpdate(node, models.emb.embedOne(working.getLabel(node)))
      case Right(s) => models.emb.embedOne(s)
    }
    // float32 storage, float64 normalization — matches the reference's
    // numpy dtype flow (category_move.py:105-107)
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    if (n == 0) v.map(_.toDouble) else v.map(x => x.toDouble / n)
  }

  /** category_move.py:67-74: cosine of unit vectors. */
  def similarity(q: Either[Long, String], k: Either[Long, String]): Double = {
    val a = entityToUnitVector(q)
    val b = entityToUnitVector(k)
    a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum
  }

  /** C3 evaluate_parent (category_move.py:139-154): subsumption scores of
    * query under each candidate; root scores 1.0; cache-aware batch. */
  def evaluateParent(query: String, candidates: Seq[Long]): Seq[Double] = {
    scoreCache.prefetch(candidates.filter(_ != 0L).map(c => (query, working.getLabel(c))))
    candidates.map {
      case 0L => 1.0
      case c => scoreCache.get(query, working.getLabel(c))
    }
  }

  /** No-node sentinel for the `masked` parameters below: node ids are
    * non-negative, so masking -1 is a no-op — the sequential C1/C4/C5
    * paths pass it implicitly via the default. */
  private val NoMask = -1L

  /** C4 evaluate_siblings (category_move.py:156-165): mean cosine of query
    * vs each candidate's children; 0 when childless. `masked` (the bulk-
    * synchronous move round's target) is excluded from every child list,
    * as it would be after the sequential engine's detach. */
  def evaluateSiblings(query: String, candidates: Seq[Long],
                       masked: Long = NoMask): Seq[Double] =
    candidates.map { c =>
      val siblings = working.getChildren(c).filterNot(_ == masked)
      if (siblings.isEmpty) 0.0
      else siblings.map(s => similarity(Right(query), Left(s))).sum / siblings.size
    }

  /** C5 select (category_move.py:167-187): weighted feature ranking.
    * np.argsort(..)[::-1] semantics preserved: ascending stable sort,
    * reversed — ties resolve to the LATER candidate. */
  def select(query: String, candidates: Seq[Long], nWinner: Int = 1,
             masked: Long = NoMask): Seq[Long] = {
    require(config.selectionFeatures.nonEmpty, "No selection feature is specified.")
    require(config.selectionFeatures.size == config.weights.size,
      "The size of weights must match the number of used features.")
    val featureScores: Seq[Seq[Double]] = config.selectionFeatures.map {
      case "parent" => evaluateParent(query, candidates)
      case "siblings" => evaluateSiblings(query, candidates, masked)
      case f => throw new IllegalArgumentException(s"Invalid selection feature: $f")
    }
    val finalScores = candidates.indices.map { i =>
      config.selectionFeatures.indices.map(j => featureScores(j)(i) * config.weights(j)).sum
    }
    candidates.indices
      .sortBy(finalScores) // ascending, stable
      .reverse
      .take(nWinner)
      .map(candidates)
  }

  /** C1 search (category_move.py:189-240): one-directional top-down
    * traversal; most-specific reduction; optionally leaf-only. With
    * `masked`, that node is pre-visited and dropped from the roots, so the
    * traversal never scores or expands it — the frozen-snapshot equivalent
    * of the sequential engine's detach (the bulk-synchronous move round's
    * target cannot become its own new parent). */
  def search(taxo: MutableTaxo, query: String,
             masked: Long = NoMask): LinkedHashMap[Long, Double] = {
    var sup = LinkedHashMap.empty[Long, Double]
    val top = taxo.getGCD(Nil).filterNot(_ == masked)
    val queue = mutable.Queue[(Long, Int)](top.map(n => (n, 0)): _*)
    if (top.nonEmpty) scoreCache.prefetch(top.map(n => (query, taxo.getLabel(n))))
    val visited = mutable.HashSet[Long](masked)
    while (queue.nonEmpty) {
      val (node, fails) = queue.dequeue()
      visited += node
      val toCache = ArrayBuffer.empty[String]
      val p = if (node == 0L) 1.0 else scoreCache.get(query, taxo.getLabel(node))
      if (p >= config.threshold) {
        sup(node) = p
        for (child <- taxo.getChildren(node) if !visited.contains(child)) {
          queue.enqueue((child, 0)); toCache += taxo.getLabel(child)
        }
        if (toCache.nonEmpty) scoreCache.prefetch(toCache.toSeq.map(l => (query, l)))
      } else if (fails < config.tolerance) {
        for (child <- taxo.getChildren(node) if !visited.contains(child)) {
          queue.enqueue((child, fails + 1)); toCache += taxo.getLabel(child)
        }
        if (toCache.nonEmpty) scoreCache.prefetch(toCache.toSeq.map(l => (query, l)))
      } else if (config.forcePrune) {
        taxo.getDescendants(node).foreach(visited += _)
      }
    }
    if (sup.isEmpty) return sup // reference would crash on set.union(*[]) here
    val supAncestors = mutable.HashSet.empty[Long]
    for (s <- sup.keys) supAncestors ++= taxo.getAncestors(s)
    sup = sup.filter { case (k, _) => !supAncestors.contains(k) }
    if (config.alwaysSearchToBottom) {
      val bottom = taxo.getLCA(Nil).toSet
      sup = sup.filter { case (k, _) => bottom.contains(k) }
    }
    sup
  }

  /** C8 rag-eligibility cache (category_move.py:76-85): the level/ignore-
    * filtered candidate set, cached ONCE per run — valid only when
    * do_update=False (the reference populates it at run start iff
    * method=='rag' and not do_update, line 398-399: moves change levels,
    * invalidating the set). */
  private var ragEligibleCache: Option[Set[Long]] = None

  def cacheRagEligibility(): Unit =
    ragEligibleCache = Some(working.filterByLevel(
      config.candidateTopLevel, config.candidateBottomLevel)
      .filterNot(config.retIgnore.contains).toSet)

  /** C2 rag (category_move.py:242-270): kNN around the old parents within
    * the level/ignore-filtered candidate set (cached when do_update=False,
    * recomputed per target otherwise — reference line 253-263). */
  def rag(query: String, oldParents: Seq[Long]): Seq[Long] = {
    require(oldParents.nonEmpty, "Either old parents must be provided or do_generate must be True")
    val subset = ragEligibleCache.getOrElse(
      working.filterByLevel(config.candidateTopLevel, config.candidateBottomLevel)
        .filterNot(config.retIgnore.contains).toSet)
    val out = mutable.LinkedHashSet.empty[Long]
    for (p <- oldParents) {
      val q = entityToUnitVector(Left(p)).map(_.toFloat)
      out ++= index.search(q, config.retrieveSize, Some(subset))._2
    }
    out.toSeq
  }

  /** C6 move (category_move.py:109-137): add `moved` edges (cycle-screened),
    * detect no-op by parent-set equality. */
  def move(target: Long, newParents: Seq[Long], oldParents: Seq[Long]): Unit = {
    val landed = ArrayBuffer.empty[Long]
    for (n <- newParents) {
      try { working.addEdge(target, n, "moved"); landed += n }
      catch { case _: CycleException => }
    }
    if (oldParents.toSet == landed.toSet) kept += 1 else moved += 1
  }

  /** C7 examine_category (category_move.py:272-318): detach, search/rag,
    * select, commit or log. */
  def examineCategory(target: Long): Unit = {
    if (!working.containsNode(target)) return
    if (target == 0L) { kept += 1; return }
    val oldParents = working.getParents(target)
    for (p <- oldParents) working.removeEdge(target, p)

    var candidates: Seq[Long] = config.method match {
      case "search" =>
        val subtaxo = working.createMoveSearchSpace(config.scopeTopLevel, config.scopeBottomLevel)
        search(subtaxo, working.getLabel(target)).keys.toSeq
      case _ => rag(working.getLabel(target), oldParents)
    }
    if (config.alwaysIncludeOld)
      candidates = (mutable.LinkedHashSet(candidates: _*) ++ oldParents).toSeq

    if (candidates.isEmpty) {
      for (p <- oldParents) working.addEdge(target, p, "moved")
      return
    }
    val winner =
      if (config.doSelect && candidates.size > 1) select(working.getLabel(target), candidates)
      else candidates
    // reference quirk preserved: with do_update=False the detached target is
    // NOT re-attached (category_move.py:310-318 never restores old edges)
    if (config.doUpdate) move(target, winner, oldParents)
    logs(target) = winner
  }

  /** Bulk-synchronous, NON-MUTATING examine for the pipeline's distributed
    * move round (KgPipeline): computes the move decision for `target`
    * against the frozen `working` snapshot with the target MASKED from the
    * traversal and from sibling means, instead of physically detaching it.
    * Returns (winners, oldParents); winners == oldParents means keep (or
    * re-attach when no candidate was found). Divergence from the
    * sequential C7/C9 path, documented like the insert round's
    * (SURVEY.md §7.4.2): search-space LEVELS are computed with the target
    * still attached; decisions within a batch do not observe each
    * other's moves — the commit applies them in deterministic target order
    * with cycle screening; and for a NON-LEAF target the mask blocks
    * traversal THROUGH it, so descendants reachable only via the target
    * cannot surface as candidates (the sequential detach re-roots the
    * target, keeping its subtree reachable — replicating that on a shared
    * frozen snapshot would need a per-target detach, the mutation this
    * path exists to avoid). The pipeline's auto-mode targets are bottom
    * concepts, where the two are equivalent. Callers must set `working`
    * (a shared broadcast snapshot is safe — nothing mutates). */
  def examineFrozen(target: Long): (Seq[Long], Seq[Long]) = {
    val oldParents = working.getParents(target)
    if (target == 0L || oldParents.isEmpty) return (oldParents, oldParents)
    val label = working.getLabel(target)
    var candidates: Seq[Long] = (config.method match {
      case "search" =>
        // the search space depends only on (working, config) — under
        // frozen semantics it is target-independent, so it is built ONCE
        // per engine instance (the sequential C7 path must rebuild per
        // target because its moves mutate the taxonomy)
        if (frozenSpace == null)
          frozenSpace = working.createMoveSearchSpace(
            config.scopeTopLevel, config.scopeBottomLevel)
        search(frozenSpace, label, masked = target).keys.toSeq
      case _ => rag(label, oldParents)
    }).filterNot(_ == target)
    if (config.alwaysIncludeOld)
      candidates = (mutable.LinkedHashSet(candidates: _*) ++ oldParents).toSeq
    if (candidates.isEmpty) (oldParents, oldParents)
    else {
      val winner =
        if (config.doSelect && candidates.size > 1)
          select(label, candidates, masked = target)
        else candidates
      (winner, oldParents)
    }
  }

  /** Set up for [[examineFrozen]] over a frozen snapshot (no deep copy —
    * nothing mutates): assigns `working` and builds the vector index only
    * if the config needs it (rag retrieval or the siblings feature). */
  private var frozenSpace: MutableTaxo = null

  def prepareFrozen(snapshot: MutableTaxo): Unit = {
    working = snapshot
    frozenSpace = null
    if (config.method == "rag" || config.selectionFeatures.contains("siblings")) {
      val ns = working.nodes.toArray
      index = new VectorIndex(ns, models.emb.embedBatched(ns.map(working.getLabel).toSeq))
    }
    // unlike the sequential run() (cache valid iff !doUpdate — moves change
    // levels), the frozen snapshot NEVER mutates, so the eligibility set is
    // always valid: cache unconditionally. Per-target recompute here was
    // two full levels() fixpoints over the snapshot per examineFrozen call
    // — O(targets × snapshot) wasted work with identical output.
    if (config.method == "rag") cacheRagEligibility()
  }

  /** [[prepareFrozen]] with a caller-supplied, already-built search space:
    * the space depends only on (snapshot, config), so KgPipeline's move
    * round computes it ONCE on the driver and broadcasts it — without
    * this every partition's engine rebuilds the identical subgraph (plus
    * its levels pass), multiplying an O(snapshot) structure by the task
    * count. Sharing is safe: nothing in the frozen path mutates it. */
  def prepareFrozen(snapshot: MutableTaxo, space: MutableTaxo): Unit = {
    prepareFrozen(snapshot)
    frozenSpace = space
  }

  /** C9 auto/manual/run (category_move.py:320-424). */
  def run(data: MutableTaxo): MutableTaxo = {
    working = data.deepCopy()
    logs.clear(); kept = 0; moved = 0
    ragEligibleCache = None
    if (config.method == "rag" || config.selectionFeatures.contains("siblings")) {
      val ns = working.nodes.toArray
      index = new VectorIndex(ns, models.emb.embedBatched(ns.map(working.getLabel).toSeq))
    }
    // category_move.py:398-399: the eligibility set is immutable iff the
    // taxonomy is (do_update=False) -- cache it once for the whole run
    if (config.method == "rag" && !config.doUpdate) cacheRagEligibility()
    val targets: Seq[Long] = config.mode match {
      case "auto" =>
        val movable = working.bottomNodes.filterNot(config.ignore.contains)
        config.maxOuterLoop.map(movable.take).getOrElse(movable)
      case _ =>
        require(config.inputConcepts.nonEmpty, "Manual mode requires input concepts")
        config.inputConcepts
    }
    targets.foreach(examineCategory)
    working
  }
}
