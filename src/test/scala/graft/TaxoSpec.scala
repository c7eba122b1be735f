package graft

import graft.core.{IconConfig, IconEngine, ScoreCache}
import graft.lexical.Tokenset
import graft.models.StubModels
import graft.taxo.{CycleException, MutableTaxo, TaxoJson, TreeTaxo}
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference unit tests (/root/reference/tests/test_taxonomy.py)
  * against the Scala core, plus engine-level decision tests. */
class TaxoSpec extends AnyFunSuite {

  /** Root(0) -> Animal(1) -> {Mammal(2), Bird(3)}; Mammal(2) -> Dog(4). */
  def animal5: MutableTaxo = MutableTaxo(
    Seq((0L, "Root"), (1L, "Animal"), (2L, "Mammal"), (3L, "Bird"), (4L, "Dog")),
    Seq((1L, 0L, "original"), (2L, 1L, "original"), (3L, 1L, "original"), (4L, 2L, "original")))

  /** Multi-parent diamond: 0 <- 1 <- {2,3} <- 4. */
  def diamond: MutableTaxo = MutableTaxo(
    Seq((0L, "Root"), (1L, "Thing"), (2L, "Left"), (3L, "Right"), (4L, "Bottom")),
    Seq((1L, 0L, "original"), (2L, 1L, "original"), (3L, 1L, "original"),
      (4L, 2L, "original"), (4L, 3L, "original")))

  test("node and edge count") {
    val t = animal5
    assert(t.numberOfNodes == 5)
    assert(t.numberOfEdges == 4)
  }

  test("get label") {
    val t = animal5
    assert(t.getLabel(0) == "Root")
    assert(t.getLabel(4) == "Dog")
    assert(Seq(1L, 2L).map(t.getLabel) == Seq("Animal", "Mammal"))
  }

  test("children and parents") {
    val t = animal5
    assert(t.getChildren(1).toSet == Set(2L, 3L))
    assert(t.getParents(2) == Seq(1L))
  }

  test("ancestors and descendants") {
    val t = animal5
    assert(t.getAncestors(4).toSet == Set(2L, 1L, 0L))
    assert(t.getDescendants(1).toSet == Set(2L, 3L, 4L))
  }

  test("leaves and roots via LCA/GCD of empty set") {
    val t = animal5
    assert(t.getLCA(Nil).toSet == Set(3L, 4L))
    assert(t.getGCD(Nil).toSet == Set(0L))
  }

  test("LCA of subset") {
    assert(animal5.getLCA(Seq(3L, 4L)).toSet == Set(1L))
  }

  test("LCA on diamond (multi-parent DAG)") {
    val t = diamond
    assert(t.getLCA(Seq(2L, 3L)).toSet == Set(1L))
    assert(t.getGCD(Seq(2L, 3L)).toSet == Set(4L))
  }

  test("subsumes") {
    val t = animal5
    assert(t.subsumes(1, 4))
    assert(!t.subsumes(3, 4))
    assert(t.subsumes(2, 2))
  }

  test("cycle prevention raises") {
    val t = animal5
    assertThrows[CycleException](t.addEdge(0, 4, "original"))
  }

  test("add node duplicate key updates attr") {
    val t = animal5
    assert(t.addNode(1, Some("Duplicate")) == 2)
    assert(t.getLabel(1) == "Duplicate")
    assert(t.addNode(1) == 1)
  }

  test("json round trip") {
    val t = animal5
    val path = java.nio.file.Files.createTempFile("taxo", ".json")
    try {
      TaxoJson.write(t, path.toString)
      val t2 = TaxoJson.load(path.toString)
      assert(t2.numberOfNodes == t.numberOfNodes)
      assert(t2.numberOfEdges == t.numberOfEdges)
      assert(t2.nodes.toSet == t.nodes.toSet)
      for (n <- t.nodes) assert(t2.getLabel(n) == t.getLabel(n))
    } finally java.nio.file.Files.delete(path)
  }

  test("json root synthesis attaches orphan tops under synthetic root 0") {
    // taxonomy.py:730-736 — tops != [0] => create root 0 + `auto` edges
    val json = """{"nodes":[{"id":1,"label":"A"},{"id":2,"label":"B"}],"edges":[{"src":2,"tgt":1,"label":"original"}]}"""
    val t = TaxoJson.loadString(json)
    assert(t.containsNode(0L) && t.getLabel(0) == "Root Concept")
    assert(t.getEdgeLabel(1, 0) == "auto")
    assert(t.getGCD(Nil) == Seq(0L))
  }

  test("reduce subset both directions") {
    val t = animal5
    assert(t.reduceSubset(Seq(1L, 4L)).toSet == Set(4L)) // most specific
    assert(t.reduceSubset(Seq(1L, 4L), reverse = true).toSet == Set(1L)) // most general
  }

  test("filter by level") {
    val t = animal5
    val level1 = t.filterByLevel(topLevel = 0, bottomLevel = 1)
    assert(level1.contains(0L))
    assert(!level1.contains(4L)) // leaf has reverse level 0
  }

  test("insertion search space contains bases") {
    val sub = animal5.createInsertionSearchSpace(Seq(3L, 4L))
    assert(sub.containsNode(3L) && sub.containsNode(4L))
    assert(sub.containsNode(1L)) // LCA(3,4) = 1 bounds the space
  }

  test("insertion search space fanout cap keeps only seed paths on flat graphs") {
    val t = new MutableTaxo
    t.addNode(0L, Some("root"))
    for (i <- 1L to 100L) { t.addNode(i, Some(s"c$i")); t.addEdge(i, 0L, "new") }
    // uncapped (reference semantics): the whole flat graph
    val full = t.createInsertionSearchSpace(Seq(3L, 7L), strict = false)
    assert(full.nodes.size == 101) // root + all 100 children (base included)
    // capped: root + the two seeds only — over-fanout expansion restricted
    // to children on paths to the seeds
    val capped = t.createInsertionSearchSpace(Seq(3L, 7L), strict = false,
      maxChildFanout = 10)
    assert(capped.nodes.toSet == Set(0L, 3L, 7L))
    assert(capped.containsEdge(3L, 0L) && capped.containsEdge(7L, 0L))
    // a fanout under the cap is untouched (exact reference semantics)
    val small = t.createInsertionSearchSpace(Seq(3L, 7L), strict = false,
      maxChildFanout = 1000)
    assert(small.nodes.toSet == full.nodes.toSet)
    // capped empty base: the root set, not a full deep copy
    val emptyCapped = t.createInsertionSearchSpace(Nil, maxChildFanout = 10)
    assert(emptyCapped.nodes.toSet == Set(0L))
  }

  test("insertion search space is linear on stacked multi-parent diamonds") {
    // 40 stacked diamonds: the reference BFS re-enqueues once per path
    // (2^40 without the processed-guard — an effective hang); the guarded
    // twin finishes instantly with the identical subgraph
    val t = new MutableTaxo
    t.addNode(100L, Some("top"))
    for (i <- 1 to 40) {
      val (prev, a, b, cur) = (100L + i - 1, 200L + i, 300L + i, 100L + i)
      t.addNode(a, Some(s"a$i")); t.addNode(b, Some(s"b$i")); t.addNode(cur, Some(s"l$i"))
      t.addEdge(a, prev, "new"); t.addEdge(b, prev, "new")
      t.addEdge(cur, a, "new"); t.addEdge(cur, b, "new")
    }
    val sub = t.createInsertionSearchSpace(Seq(140L), cropTop = false, strict = false)
    assert(sub.nodes.size == 1 + 3 * 40)
    assert(sub.edges.size == 4 * 40)
  }

  test("tree taxonomy enforces single parent") {
    val t = new TreeTaxo(0L)
    for ((id, l) <- Seq((0L, "Root"), (1L, "A"), (2L, "B"), (3L, "C"))) t.addNode(id, Some(l))
    t.addEdgeTree(1, 0, "original")
    t.addEdgeTree(2, 0, "original")
    t.addEdgeTree(3, 1, "original")
    assertThrows[Exception](t.addEdgeTree(3, 2, "original"))
    assert(t.getParent(3).contains(1L))
    assert(t.getSiblings(1) == Seq(2L))
    assert(t.getBreadcrumb(3) == Seq(0L, 1L, 3L))
  }

  test("depth and wu-palmer") {
    val t = animal5
    assert(t.getDepth(0) == 0)
    assert(t.getDepth(4) == 3)
    assert(t.wuPalmer(3, 4) == 2.0 * 1 / (2 + 3))
  }

  test("transitive reduction removes redundant edge and keeps attrs") {
    val t = animal5
    t.addEdge(4, 1, "new") // redundant: 4 -> 2 -> 1
    val tr = t.transitiveReduction()
    assert(!tr.containsEdge(4, 1))
    assert(tr.numberOfEdges == 4)
    assert(tr.getLabel(4) == "Dog")
    assert(tr.getEdgeLabel(4, 2) == "original")
  }

  test("levels match reference annotate semantics") {
    val t = diamond
    val lv = t.levels()
    assert(lv(0L) == 0 && lv(1L) == 1 && lv(4L) == 3)
    val rl = t.reverseLevels()
    assert(rl(4L) == 0 && rl(0L) == 3)
  }

  test("tokenset is deterministic, breadcrumb-aware, order-preserving") {
    assert(Tokenset.tokens("Dogs > Small Dogs") == Seq("dog", "small"))
    assert(Tokenset.tokens("The Cats and Dogs") == Seq("cat", "dog"))
    assert(Tokenset.hash64("Small Dogs") == Tokenset.hash64("small dog"))
    assert(Tokenset.hash64("dog") != Tokenset.hash64("cat"))
  }

  test("stub scorer containment semantics") {
    val sub = StubModels().sub
    assert(sub.scoreOne("pet dog", "dog") == 1.0) // "dog" tokens ⊆ "pet dog"
    assert(sub.scoreOne("dog", "pet dog") == 0.25) // (1/2)^2
    assert(sub.scoreOne("dog", "cat") == 0.0)
  }

  test("manual-mode insertion places a new concept") {
    // "given the Animal taxonomy and new concept 'Pet Mammal' with base {Mammal}"
    val models = StubModels()
    val cfg = IconConfig(mode = "manual", inputConcepts = Seq("Small Mammal"),
      manualConceptBases = Some(Seq(Seq(2L))), filterSubset = false)
    val engine = new IconEngine(models, cfg)
    val result = engine.run(animal5)
    // Stub scorer: P("Small Mammal" ⊑ "Mammal") = 1.0 ⇒ sup at node 2
    val d = engine.logs("Small Mammal")
    assert(d.eqv.isDefined || d.sup.nonEmpty)
    assert(engine.scoreCache.pairsScored > 0)
  }

  test("manual-mode genuinely new concept is inserted with key max+1") {
    val models = StubModels()
    val cfg = IconConfig(mode = "manual", inputConcepts = Seq("Poodle Dog"),
      manualConceptBases = Some(Seq(Seq(4L))))
    val engine = new IconEngine(models, cfg)
    val result = engine.run(animal5)
    val d = engine.logs("Poodle Dog")
    assert(d.eqv.isEmpty)
    assert(d.sup.map(_._1).contains(4L)) // P("Poodle Dog" ⊑ "Dog") = 1.0
    assert(result.containsNode(5L) && result.getLabel(5) == "Poodle Dog")
    assert(result.containsEdge(5L, 4L))
    assert(engine.progress == (1L, 1L))
  }

  test("equivalent label maps to existing node via lexical check") {
    val models = StubModels()
    val cfg = IconConfig(mode = "manual", inputConcepts = Seq("dogs"),
      manualConceptBases = Some(Seq(Seq(2L))))
    val engine = new IconEngine(models, cfg)
    val result = engine.run(animal5)
    val d = engine.logs("dogs")
    assert(d.eqv.map(_._1).contains(4L)) // tokenset("dogs") == tokenset("Dog")
    assert(result.numberOfNodes == 5) // nothing new created
  }

  test("insert discards cycle-creating edges silently") {
    val models = StubModels()
    val engine = new IconEngine(models, IconConfig(mode = "manual", inputConcepts = Seq("x")))
    engine.working = animal5
    engine.nextKey = 5L
    engine.loadLexical(engine.working)
    val (n, e) = engine.insert("X Concept", None, sup = Seq(4L), sub = Seq(0L))
    assert(n == 1L)
    assert(e == 1L) // only the sup edge lands; sub edge 0 -> new would cycle? (0 is ancestor of 4)
  }

  test("run restores original edges after transitive reduction") {
    val models = StubModels()
    val cfg = IconConfig(mode = "manual", inputConcepts = Seq("Animal Kingdom"),
      manualConceptBases = Some(Seq(Seq(1L))))
    val engine = new IconEngine(models, cfg)
    val data = animal5
    val result = engine.run(data)
    for ((u, v, _) <- data.edges) assert(result.containsEdge(u, v), s"original edge $u->$v lost")
  }

  test("createMoveSearchSpace walks edges, not paths (diamond ladder)") {
    // 40 stacked diamonds = 2^40 root-to-leaf paths: the per-path BFS
    // (no expansion dedupe) would never finish; the edge-walk completes
    // instantly and must reproduce the full graph at an all-pass scope
    val t = new MutableTaxo
    t.addNode(0L, Some("root"))
    var prev = Seq(0L)
    var id = 1L
    for (_ <- 1 to 40) {
      val (a, b) = (id, id + 1); id += 2
      t.addNode(a, Some(s"a$a")); t.addNode(b, Some(s"b$b"))
      for (p <- prev) { t.addEdge(a, p, "original"); t.addEdge(b, p, "original") }
      prev = Seq(a, b)
    }
    val s = t.createMoveSearchSpace(0, 0)
    assert(s.numberOfNodes == t.numberOfNodes)
    assert(s.edges.map(e => (e._1, e._2)).toSet == t.edges.map(e => (e._1, e._2)).toSet)
  }
}
