package graft

import graft.core.{IconConfig, IconEngine}
import graft.lexical.Tokenset
import graft.models.StubModels
import graft.taxo.MutableTaxo
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property tests over generated DAGs (SURVEY.md §5.3 item 3). Seeded
  * generator (no scalatestplus bridge in the offline cache) — 60 random
  * DAGs per property, reproducible. */
class PropertySpec extends AnyFunSuite {

  /** Random DAG: nodes 0..n-1 (0 = root); node i>0 gets 1-3 parents from
    * {0..i-1} — acyclic by construction, multi-parent, deterministic. */
  def genDag(rng: Random): MutableTaxo = {
    val n = 3 + rng.nextInt(22)
    val t = new MutableTaxo
    for (i <- 0 until n) t.addNode(i.toLong, Some(s"node $i label${i % 7}"))
    for (i <- 1 until n) {
      val k = 1 + rng.nextInt(3)
      for (_ <- 0 until k) t.addEdge(i.toLong, rng.nextInt(i).toLong, "original")
    }
    t
  }

  def forDags(seed: Long, iters: Int = 60)(body: (MutableTaxo, Random) => Unit): Unit = {
    val rng = new Random(seed)
    for (it <- 0 until iters) {
      val t = genDag(rng)
      withClue(s"iteration $it (${t.numberOfNodes} nodes): ")(body(t, rng))
    }
  }

  test("transitive reduction preserves reachability and never adds edges") {
    forDags(1L) { (t, _) =>
      val tr = t.transitiveReduction()
      for (n <- t.nodes)
        assert(t.getAncestors(n).toSet == tr.getAncestors(n).toSet, s"reachability changed at $n")
      assert(tr.numberOfEdges <= t.numberOfEdges)
    }
  }

  test("reduceSubset returns exactly the minimal antichain") {
    forDags(2L) { (t, rng) =>
      val subset = t.nodes.filter(_ => rng.nextBoolean())
      if (subset.nonEmpty) {
        val reduced = t.reduceSubset(subset)
        for (a <- reduced; b <- reduced if a != b)
          assert(!t.subsumes(a, b), s"$a subsumes $b inside reduced set")
        for (x <- subset.filterNot(reduced.contains))
          assert(reduced.exists(r => x != r && t.subsumes(x, r)), s"$x removed without cause")
        val reducedRev = t.reduceSubset(subset, reverse = true)
        for (a <- reducedRev; b <- reducedRev if a != b)
          assert(!t.subsumes(b, a))
      }
    }
  }

  test("LCA members subsume all inputs and form an antichain; GCD dual") {
    forDags(3L) { (t, _) =>
      val inputs = t.nodes.takeRight(2)
      val lca = t.getLCA(inputs)
      for (a <- lca; i <- inputs) assert(t.subsumes(a, i), s"LCA $a misses $i")
      for (a <- lca; b <- lca if a != b) assert(!t.subsumes(a, b))
      val tops = t.nodes.take(2)
      for (d <- t.getGCD(tops); i <- tops) assert(t.subsumes(i, d), s"GCD $d misses $i")
    }
  }

  test("insert never creates cycles even with adversarial sup/sub") {
    forDags(4L) { (t, _) =>
      val engine = new IconEngine(StubModels(), IconConfig(mode = "manual",
        inputConcepts = Seq("x")))
      engine.working = t.deepCopy()
      engine.nextKey = t.nodes.max + 1
      engine.loadLexical(engine.working)
      engine.insert("fresh concept", None,
        sup = t.nodes.takeRight(2), sub = t.nodes.take(2))
      for (n <- engine.working.nodes)
        assert(!engine.working.getAncestors(n).contains(n), s"cycle at $n")
    }
  }

  test("tokenset hash stable; breadcrumb splits to segment-token union") {
    val rng = new Random(5L)
    for (_ <- 0 until 200) {
      val a = rng.alphanumeric.take(rng.nextInt(12)).mkString
      val b = rng.alphanumeric.take(rng.nextInt(12)).mkString
      assert(Tokenset.hash64(a) == Tokenset.hash64(a))
      assert(Tokenset.tokens(s"$a > $b").toSet ==
        (Tokenset.tokens(a) ++ Tokenset.tokens(b)).toSet)
    }
  }

  test("breadcrumb normalization (L3) strips ids and relinks") {
    assert(Tokenset.normaliseBreadcrumb("Shoes (12) > Boots (34)", "symbol") == "Shoes > Boots")
    assert(Tokenset.normaliseBreadcrumb("Shoes (12) > Boots (34)", "word") ==
      "Shoes contains Boots.")
    assert(Tokenset.normaliseBreadcrumb("a > b", "raw") == "a > b")
    assert(Tokenset.breadcrumbScreening("red dog", "red dogs") == (true, true))
    assert(Tokenset.breadcrumbScreening("red dog", "blue cat") == (false, false))
  }
}
