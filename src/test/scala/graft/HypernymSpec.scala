package graft

import graft.lexical.{HypernymProvider, Tokenset}
import org.scalatest.funsuite.AnyFunSuite

/** L2/L5 hypernym helpers (tokenset_utils.py:80-151) over a deterministic
  * map-backed lexicon (poodle -> dog -> animal; cat -> animal). */
class HypernymSpec extends AnyFunSuite {

  private val p = HypernymProvider.MapProvider(Map(
    "poodle" -> Seq("dog"), "dog" -> Seq("animal"), "cat" -> Seq("animal")))

  test("hypernym: transitivity, equality, and None-semantics") {
    assert(Tokenset.hypernym(p, "dog", "poodle"))
    assert(Tokenset.hypernym(p, "animal", "poodle")) // transitive
    assert(!Tokenset.hypernym(p, "poodle", "dog"))   // direction matters
    assert(!Tokenset.hypernym(p, "dog", "cat"))
    assert(Tokenset.hypernym(p, "dog", "dog"))       // equality
    assert(Tokenset.hypernym(p, null, null))         // word2 None => true
    assert(Tokenset.hypernym(p, "x", null))
    assert(!Tokenset.hypernym(p, null, "x"))
  }

  test("hypernym with Empty provider degrades to equality") {
    assert(Tokenset.hypernym(HypernymProvider.Empty, "dog", "dog"))
    assert(!Tokenset.hypernym(HypernymProvider.Empty, "dog", "poodle"))
  }

  test("hypernymReduce keeps the most specific terms") {
    val toks = Seq(("animal", ""), ("poodle", ""), ("dog", ""), ("cat", ""))
    val reduced = Tokenset.hypernymReduce(p, toks)
    // animal (hypernym of poodle/cat) and dog (hypernym of poodle) drop
    assert(reduced.map(_._1).toSet == Set("poodle", "cat"))
    // Empty provider: identity (no lexicon => nothing subsumes anything)
    assert(Tokenset.hypernymReduce(HypernymProvider.Empty, toks) == toks)
  }

  test("provider-aware breadcrumb screening uses the reduction") {
    // "dog food" vs "poodle food": reduced union = {poodle, food}; dog is
    // subsumed, so text2 covers the union exactly and text1 misses poodle
    val (c1, c2) = Tokenset.breadcrumbScreening(p, "dog food", "poodle food", 0, usePos = false)
    assert(!c1 && c2)
    val (r1, _) = Tokenset.breadcrumbScreening(p, "dog food", "poodle food", 1, usePos = false)
    assert(r1) // relax=1 tolerates the one uncovered token
  }

  test("keywordString joins the reduced tokenset") {
    assert(Tokenset.keywordString(p, "animal poodle accessories") == "poodle, accessory")
  }

  test("commonParent accumulates the most general related tokens (L5)") {
    // poodle vs cat: related through animal? hypernym(poodle, cat)=false both
    // ways, so nothing accumulates; dog vs poodle: dog is the hyper
    assert(Tokenset.commonParent(p, "poodle", "cat").isEmpty)
    assert(Tokenset.commonParent(p, "dog food", "poodle food").map(_._1) ==
      Seq("dog", "food"))
    // order preserved, duplicates dropped (listadd semantics)
    assert(Tokenset.commonParent(p, "dog dog food", "poodle food").map(_._1) ==
      Seq("dog", "food"))
    // symmetric containment picks the more general side from either set
    assert(Tokenset.commonParent(p, "poodle", "dog").map(_._1) == Seq("dog"))
  }

  test("toDisplayString renders 'None' for empty and comma-joins words (L5)") {
    assert(Tokenset.toDisplayString(Nil) == "None")
    assert(Tokenset.toDisplayString(Seq(("dog", ""), ("food", ""))) == "dog, food")
    assert(Tokenset.toDisplayString(Seq(("dog", ""))) == "dog")
  }

  test("hyper/hypo pick the more general/specific token") {
    val d = Some(("dog", ""))
    val po = Some(("poodle", ""))
    val c = Some(("cat", ""))
    assert(Tokenset.hyper(p, d, po) == d)
    assert(Tokenset.hyper(p, po, d) == d)
    assert(Tokenset.hyper(p, d, c).isEmpty)
    assert(Tokenset.hyper(p, None, d) == d)
    assert(Tokenset.hypo(p, d, po) == po)
    assert(Tokenset.hypo(p, po, d) == po)
    assert(Tokenset.hypo(p, d, c).isEmpty)
    assert(Tokenset.hypo(p, None, d).isEmpty)
  }
}
