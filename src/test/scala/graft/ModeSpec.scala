package graft

import graft.core.{IconConfig, IconEngine}
import graft.models.StubModels
import graft.taxo.{MutableTaxo, OwlReader, TreeTaxo}
import org.scalatest.funsuite.AnyFunSuite

/** Auto mode (P7), OWL reader (S3), tree specializations (G20). */
class ModeSpec extends AnyFunSuite {

  def domain: MutableTaxo = graft.pipeline.KgPipeline.seedTaxo()

  test("auto mode is deterministic and terminates on pool exhaustion") {
    def run() = {
      val engine = new IconEngine(graft.pipeline.KgPipeline.domainModels(),
        IconConfig(mode = "auto", maxOuterLoop = Some(4), retrieveSize = 4))
      engine.run(domain)
      engine
    }
    val a = run()
    val b = run()
    assert(a.logs.toSeq == b.logs.toSeq) // deterministic hash-ranked seeds
    assert(a.working.numberOfNodes >= domain.numberOfNodes)
  }

  test("semiauto mode generates union labels and places them") {
    val engine = new IconEngine(graft.pipeline.KgPipeline.domainModels(),
      IconConfig(mode = "semiauto", semiautoSeeds = Seq(11L, 21L),
        retrieveSize = 4, filterSubset = false))
    engine.run(domain)
    assert(engine.logs.nonEmpty)
  }

  test("OWL reader extracts classes, subClassOf, root and applies TR") {
    val owl =
      """<?xml version="1.0"?>
        |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
        |         xmlns:owl="http://www.w3.org/2002/07/owl#">
        |  <owl:Class rdf:about="http://x.org/onto#1">
        |    <rdfs:label>Animal</rdfs:label>
        |    <rdfs:subClassOf rdf:resource="http://www.w3.org/2002/07/owl#Thing"/>
        |  </owl:Class>
        |  <owl:Class rdf:about="http://x.org/onto#2">
        |    <rdfs:label>Mammal</rdfs:label>
        |    <rdfs:subClassOf rdf:resource="http://x.org/onto#1"/>
        |  </owl:Class>
        |  <owl:Class rdf:about="http://x.org/onto#3">
        |    <rdfs:label>Dog</rdfs:label>
        |    <rdfs:subClassOf rdf:resource="http://x.org/onto#2"/>
        |    <rdfs:subClassOf rdf:resource="http://x.org/onto#1"/>
        |  </owl:Class>
        |</rdf:RDF>""".stripMargin
    val path = java.nio.file.Files.createTempFile("onto", ".owl")
    java.nio.file.Files.writeString(path, owl)
    val t = OwlReader.fromOwl(path.toString)
    assert(t.getLabel(0) == "Root Concept")
    assert(t.getLabel(1) == "Animal" && t.getLabel(2) == "Mammal" && t.getLabel(3) == "Dog")
    assert(t.containsEdge(1, 0) && t.containsEdge(2, 1) && t.containsEdge(3, 2))
    assert(!t.containsEdge(3, 1), "transitive reduction should drop Dog->Animal")
    assert(t.linkIri("http://x.org/onto#2") == 2L)
  }

  test("OWL reader scopes properties per class and accepts nested named-class subClassOf") {
    // rdflib (the reference's parser) emits <#1> rdfs:subClassOf <#7> for
    // the nested-class form, and never attributes a nested class's label
    // or subClassOf to the OUTER class — descendant-scoped DOM queries did
    // both wrong
    val owl =
      """<?xml version="1.0"?>
        |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
        |         xmlns:owl="http://www.w3.org/2002/07/owl#">
        |  <owl:Class rdf:about="http://x.org/onto#1">
        |    <rdfs:label>Inner Parent Form</rdfs:label>
        |    <rdfs:subClassOf>
        |      <owl:Class rdf:about="http://x.org/onto#7">
        |        <rdfs:label>Nested Named</rdfs:label>
        |        <rdfs:subClassOf rdf:resource="http://www.w3.org/2002/07/owl#Thing"/>
        |      </owl:Class>
        |    </rdfs:subClassOf>
        |  </owl:Class>
        |</rdf:RDF>""".stripMargin
    val path = java.nio.file.Files.createTempFile("onto_nested", ".owl")
    java.nio.file.Files.writeString(path, owl)
    val t = OwlReader.fromOwl(path.toString)
    // edge 1->7 from the nested form; 7->0 from the inner resource form —
    // and NOT 1->0 (the inner subClassOf must not leak to the outer class)
    assert(t.containsEdge(7, 0), "nested class's own subClassOf must reach Thing")
    assert(t.containsEdge(1, 7), "nested named-class subClassOf must become an edge")
    assert(!t.containsEdge(1, 0), "inner subClassOf must not be attributed to the outer class")
    assert(t.getLabel(1) == "Inner Parent Form" && t.getLabel(7) == "Nested Named")
  }

  test("tree subsumes and LCA specializations") {
    val t = new TreeTaxo(0L)
    for ((id, l) <- Seq((0L, "R"), (1L, "A"), (2L, "B"), (3L, "C"), (4L, "D"))) t.addNode(id, Some(l))
    t.addEdgeTree(1, 0, "original")
    t.addEdgeTree(2, 1, "original")
    t.addEdgeTree(3, 1, "original")
    t.addEdgeTree(4, 3, "original")
    assert(t.subsumesTree(1, 4) && !t.subsumesTree(2, 4))
    assert(t.getLCATree(Seq(2L, 4L)) == Seq(1L))
    assert(t.getLCATree(Nil).toSet == Set(2L, 4L))
    assert(t.getDepthTree(4) == 3)
  }
}
