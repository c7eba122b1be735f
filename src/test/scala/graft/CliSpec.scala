package graft

import graft.core.ConfigLoader
import graft.taxo.{MutableTaxo, TaxoJson}

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}

/** S4 CLI parity (cli/main.py:18-114): view tree preview, OWL dispatch,
  * validate checks, convert, config-driven enrich. */
class CliSpec extends SparkSpecBase {

  private def animal5: MutableTaxo = MutableTaxo(
    Seq((0L, "Root"), (1L, "Animal"), (2L, "Mammal"), (3L, "Bird"), (4L, "Dog")),
    Seq((1L, 0L, "original"), (2L, 1L, "original"), (3L, 1L, "original"), (4L, 2L, "original")))

  private def tmpJson(t: MutableTaxo): String = {
    val p = Files.createTempFile("cli_taxo", ".json").toString
    TaxoJson.write(t, p)
    p
  }

  private def captureOut(f: => Unit): String = {
    val bos = new ByteArrayOutputStream()
    Console.withOut(bos)(f)
    bos.toString("UTF-8")
  }

  test("view prints reference-format stats and a depth-bounded tree preview") {
    val path = tmpJson(animal5)
    val out = captureOut(Cli.main(Array("view", path, "--depth", "1")))
    assert(out.contains("Nodes : 5"))
    assert(out.contains("Edges : 4"))
    assert(out.contains("Roots : 1"))
    assert(out.contains("Leaves: 2"))
    assert(out.contains("Tree preview (depth <= 1):"))
    assert(out.contains("Root") && out.contains("  Animal"))
    // depth 1 cuts Mammal's child Dog
    assert(!out.contains("Dog"))
  }

  test("view tree preview keeps the reference's shared-visited-set quirk") {
    // diamond: Bottom has two parents; it must print only once
    val diamond = MutableTaxo(
      Seq((0L, "Root"), (2L, "Left"), (3L, "Right"), (4L, "Bottom")),
      Seq((2L, 0L, "original"), (3L, 0L, "original"),
        (4L, 2L, "original"), (4L, 3L, "original")))
    val lines = captureOut(Cli.treePreview(diamond, 3, println)).linesIterator.toSeq
    assert(lines.count(_.trim == "Bottom") == 1)
  }

  test("validate passes a DAG and flags a cyclic core") {
    import spark.implicits._
    val t = animal5
    val nodes = t.nodes.toSeq.map(n => (n, t.getLabel(n))).toDF("id", "label")
    val edges = t.edges.map { case (u, v, l) => (u, v, l) }.toDF("src", "dst", "label")
    val msgs = scala.collection.mutable.ArrayBuffer.empty[String]
    assert(Cli.runValidate(nodes, edges, msgs += _))
    assert(msgs.last == "OK: Taxonomy is valid.")

    val cyc = Seq((1L, 2L, "x"), (2L, 3L, "x"), (3L, 1L, "x")).toDF("src", "dst", "label")
    val cnodes = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "label")
    val msgs2 = scala.collection.mutable.ArrayBuffer.empty[String]
    assert(!Cli.runValidate(cnodes, cyc, msgs2 += _))
    assert(msgs2.exists(_.startsWith("FAIL: Taxonomy contains cycles.")))
  }

  test("validate treats orphan WARN as a failure (reference exit-code parity)") {
    import spark.implicits._
    // node 5 has no edges at all -> orphan; reference (main.py:89-96) puts
    // the WARN in the errors list, suppresses the OK line, and exits 1
    val nodes = Seq((0L, "Root"), (1L, "Animal"), (5L, "Loner")).toDF("id", "label")
    val edges = Seq((1L, 0L, "original")).toDF("src", "dst", "label")
    val msgs = scala.collection.mutable.ArrayBuffer.empty[String]
    assert(!Cli.runValidate(nodes, edges, msgs += _))
    assert(msgs == Seq("WARN: 1 orphan node(s) found."))
    // root (id 0) is exempt even with no edges
    val justRoot = Seq((0L, "Root")).toDF("id", "label")
    val noEdges = Seq.empty[(Long, Long, String)].toDF("src", "dst", "label")
    val msgs2 = scala.collection.mutable.ArrayBuffer.empty[String]
    assert(Cli.runValidate(justRoot, noEdges, msgs2 += _))
    assert(msgs2 == Seq("OK: Taxonomy is valid."))
  }

  test("loadDF tolerates JSON where no node/edge carries a label key") {
    // schema inference drops the field entirely; col("e.label") would fail
    val p = Files.createTempFile("cli_nolabel", ".json")
    Files.writeString(p,
      """{"nodes": [{"id": 0, "label": "Root"}, {"id": 1, "label": "a"},
        |           {"id": 2, "label": "b"}, {"id": 3, "label": "c"}],
        |"edges": [{"src": 1, "tgt": 2}, {"src": 2, "tgt": 3}, {"src": 3, "tgt": 1}]}""".stripMargin)
    val (nodes, edges) = TaxoJson.loadDF(spark, p.toString)
    assert(edges.columns.toSeq == Seq("src", "dst", "label"))
    val msgs = scala.collection.mutable.ArrayBuffer.empty[String]
    assert(!Cli.runValidate(nodes, edges, msgs += _))
    assert(msgs.exists(_.startsWith("FAIL: Taxonomy contains cycles.")))
  }

  test("loadDF root synthesis drops edges incident to the displaced node 0 (driver parity)") {
    import spark.implicits._
    // node 0 exists with a PARENT edge 0->5: the driver's synthesizeRoot
    // removeNode(0) cascade drops that edge before re-minting the root;
    // keeping it would make the new root a child of 5 (a cycle once 5
    // gets its auto edge to the root)
    val json =
      """{"nodes": [{"id": 0, "label": "old"}, {"id": 5, "label": "a"},
        |           {"id": 9, "label": "b"}],
        |"edges": [{"src": 0, "tgt": 5}]}""".stripMargin
    val p = Files.createTempFile("cli_root0", ".json")
    Files.writeString(p, json)
    val (nodes, edges) = TaxoJson.loadDF(spark, p.toString)
    val dfEdges = edges.select("src", "dst", "label")
      .as[(Long, Long, String)].collect().toSet
    val driver = TaxoJson.loadString(json)
    val driverEdges = driver.edges.toSet
    assert(dfEdges == driverEdges, s"DF $dfEdges vs driver $driverEdges")
    assert(dfEdges == Set((5L, 0L, "auto"), (9L, 0L, "auto")))
    assert(nodes.as[(Long, String)].collect().toMap.keySet == Set(0L, 5L, 9L))
  }

  test("validate dispatches OWL input by extension") {
    val owl =
      """<?xml version="1.0"?>
        |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
        |         xmlns:owl="http://www.w3.org/2002/07/owl#">
        |  <owl:Class rdf:about="http://x.org/onto#1">
        |    <rdfs:label>Animal</rdfs:label>
        |    <rdfs:subClassOf rdf:resource="http://www.w3.org/2002/07/owl#Thing"/>
        |  </owl:Class>
        |</rdf:RDF>""".stripMargin
    val p = Files.createTempFile("cli_taxo", ".owl")
    Files.writeString(p, owl)
    val t = Cli.loadTaxo(p.toString)
    assert(t.nodes.nonEmpty)
  }

  test("convert normalizes OWL/JSON to JSON and refuses non-JSON output") {
    val src = tmpJson(animal5)
    val dst = Files.createTempFile("cli_out", ".json").toString
    val out = captureOut(Cli.main(Array("convert", src, dst)))
    assert(out.contains(s"Saved JSON taxonomy to $dst"))
    val round = TaxoJson.load(dst)
    assert(round.nodes.size == 5 && round.edges.size == 4)
  }

  test("enrich without --config prints the scaffold pointer (reference parity)") {
    val path = tmpJson(animal5)
    val out = captureOut(Cli.main(Array("enrich", path)))
    assert(out.contains("--config"))
  }

  test("enrich with a config file runs the engine and writes the result") {
    val path = tmpJson(animal5)
    val cfg = Files.createTempFile("cli_cfg", ".json")
    Files.writeString(cfg,
      """{"mode": "manual", "input_concepts": ["Poodle Dog"], "auto_bases": true,
        |"retrieve_size": 3, "threshold": 0.5, "do_update": true,
        |"not_a_real_key": 42}""".stripMargin)
    val outPath = Files.createTempFile("cli_enriched", ".json").toString
    val out = captureOut(Cli.main(Array("enrich", path, "--config", cfg.toString, "-o", outPath)))
    assert(out.contains("Enriched taxonomy written to"))
    val enriched = TaxoJson.load(outPath)
    assert(enriched.nodes.size >= 5)
  }

  test("config loader maps reference leaf names and ignores unknown keys") {
    val icon = ConfigLoader.iconFromString(
      """{"mode": "semiauto", "threshold": 0.7, "tolerance": 2,
        |"semiauto_seeds": [3, 4], "max_outer_loop": 5,
        |"manual_concept_bases": [[1, 2], [3]],
        |"subgraph_force": [["auto"], ["original", "new"]],
        |"max_child_fanout": 10000,
        |"rand_seed": 42, "do_lexical_check": false, "bogus": true}""".stripMargin)
    assert(icon.mode == "semiauto")
    assert(icon.threshold == 0.7)
    assert(icon.tolerance == 2)
    assert(icon.semiautoSeeds == Seq(3L, 4L))
    assert(icon.maxOuterLoop.contains(5))
    assert(icon.manualConceptBases.contains(Seq(Seq(1L, 2L), Seq(3L))))
    assert(icon.subgraphForce == Seq(Set("auto"), Set("original", "new")))
    assert(icon.randSeed == 42L)
    assert(icon.maxChildFanout == 10000)
    assert(!icon.doLexicalCheck)
    // defaults survive for unspecified keys
    assert(icon.retrieveSize == 10 && icon.doUpdate)

    val move = ConfigLoader.moveFromString(
      """{"method": "rag", "weights": [0.3, 0.7], "ignore": [0],
        |"selection_features": ["parent"], "scope_top_level": 2}""".stripMargin)
    assert(move.method == "rag")
    assert(move.weights == Seq(0.3, 0.7))
    assert(move.ignore == Set(0L))
    assert(move.selectionFeatures == Seq("parent"))
    assert(move.scopeTopLevel == 2)
  }

  test("paths referenced by fixture oracles exist") {
    for (q <- Seq("q24_kg_triples", "q25_extract_text", "q30_media_features"))
      assert(Files.exists(Paths.get(s"src/test/resources/fixtures/$q.parquet")), q)
  }
}
