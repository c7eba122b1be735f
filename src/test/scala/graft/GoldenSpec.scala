package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.core.{IconConfig, IconEngine}
import graft.models.StubModels
import graft.taxo.TaxoJson
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Decision-parity goldens: the reference implementation (jingcshi/ICON) was
  * run with bit-compatible deterministic stub models (tools/golden_gen.py)
  * and its prediction logs exported; this suite runs the Scala engine on the
  * same inputs and checks triple-level precision/recall ≥ 0.95
  * (BASELINE.json metric). */
class GoldenSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  case class GoldenDecision(label: String, eqv: Set[(Long, Double)],
                            sup: Set[(Long, Double)], sub: Set[(Long, Double)])

  private def loadGolden(name: String) = {
    val in = getClass.getResourceAsStream(s"/goldens/$name.json")
    require(in != null, s"missing golden $name")
    val root = mapper.readTree(in)
    val taxoJson = root.get("taxonomy").toString
    val decisions = root.get("decisions").elements().asScala.map { d =>
      def pairs(field: String, scoreField: String) =
        d.get(field).elements().asScala
          .map(e => (e.get("node").asLong(), e.get(scoreField).asDouble())).toSet
      GoldenDecision(d.get("label").asText(), pairs("eqv", "score"),
        pairs("sup", "p"), pairs("sub", "p"))
    }.toSeq
    (root, taxoJson, decisions)
  }

  /** Placement-triple P/R between golden and engine decisions. */
  private def comparePR(golden: Seq[GoldenDecision],
                        mine: Map[String, graft.core.Decision],
                        allInputs: Seq[String]): (Double, Double) = {
    def triples(label: String, eqv: Set[(Long, Double)], sup: Set[(Long, Double)],
                sub: Set[(Long, Double)]): Set[(String, String, String)] =
      eqv.map(e => (label, "sameAs", e._1.toString)) ++
        sup.map(s => (label, "isA", s._1.toString)) ++
        sub.map(s => (s._1.toString, "isA", label))
    val goldenSet = golden.flatMap(g => triples(g.label, g.eqv, g.sup, g.sub)).toSet
    val mineSet = allInputs.flatMap { l =>
      mine.get(l).toSeq.flatMap { d =>
        triples(l, d.eqv.map(e => (e._1, e._2)).toSet, d.sup.toSet, d.sub.toSet)
      }
    }.toSet
    val inter = (goldenSet intersect mineSet).size.toDouble
    val p = if (mineSet.isEmpty) 1.0 else inter / mineSet.size
    val r = if (goldenSet.isEmpty) 1.0 else inter / goldenSet.size
    (p, r)
  }

  private def longs(node: com.fasterxml.jackson.databind.JsonNode, f: String): Seq[Long] =
    node.get(f).elements().asScala.map(_.asLong()).toSeq

  private def runManual(root: com.fasterxml.jackson.databind.JsonNode, taxoJson: String,
                        cfgMod: IconConfig => IconConfig = identity): IconEngine = {
    val inputs = root.get("inputs").elements().asScala.map(_.asText()).toSeq
    val bases = root.get("bases").elements().asScala
      .map(b => b.elements().asScala.map(_.asLong()).toSeq).toSeq
    val cfg = cfgMod(IconConfig(mode = "manual", inputConcepts = inputs,
      manualConceptBases = Some(bases), doUpdate = false))
    val engine = new IconEngine(StubModels(), cfg)
    engine.run(TaxoJson.loadString(taxoJson))
    engine
  }

  private def assertParity(name: String, engine: IconEngine,
                           root: com.fasterxml.jackson.databind.JsonNode,
                           decisions: Seq[GoldenDecision], inputs: Seq[String]): Unit = {
    val mine = engine.logs.toMap
    val (p, r) = comparePR(decisions, mine, inputs)
    info(f"$name: precision=$p%.4f recall=$r%.4f (golden=${decisions.size} mine=${mine.size})")
    assert(p >= 0.95, s"$name precision $p < 0.95")
    assert(r >= 0.95, s"$name recall $r < 0.95")
    // inputs absent from golden logs were rejected by the reference —
    // the engine must reject them too (or produce an empty decision)
    val goldenLabels = decisions.map(_.label).toSet
    for (l <- inputs if !goldenLabels.contains(l); d <- mine.get(l))
      assert(d.eqv.isEmpty && d.sup.isEmpty, s"$name: '$l' rejected by reference but not by engine")
  }

  test("manual_animal5 decisions and final taxonomy match the reference") {
    val (root, taxoJson, decisions) = loadGolden("manual_animal5")
    val inputs = root.get("inputs").elements().asScala.map(_.asText()).toSeq
    val engine = runManual(root, taxoJson)
    assertParity("manual_animal5", engine, root, decisions, inputs)

    // do_update=true end state: nodes/edges equal to the reference's
    val engine2 = runManual(root, taxoJson, _.copy(doUpdate = true))
    val result = engine2.working
    val wantNodes = root.get("final_nodes").elements().asScala
      .map(n => (n.get(0).asLong(), n.get(1).asText())).toSet
    val wantEdges = root.get("final_edges").elements().asScala
      .map(e => (e.get(0).asLong(), e.get(1).asLong(), e.get(2).asText())).toSet
    assert(result.nodes.map(n => (n, result.getLabel(n))).toSet == wantNodes)
    assert(result.edges.toSet == wantEdges)
  }

  test("manual_google300 (300-node Google Product Type sample) parity") {
    val (root, taxoJson, decisions) = loadGolden("manual_google300")
    val inputs = root.get("inputs").elements().asScala.map(_.asText()).toSeq
    val engine = runManual(root, taxoJson)
    assertParity("manual_google300", engine, root, decisions, inputs)
  }

  test("manual_google300 parity from a pure config-file artifact") {
    // the same golden scenario driven entirely by a JSON config document
    // through ConfigLoader (reference: icon_config_from_yaml, config.py:
    // 226-230) — proves a run is reproducible from a config artifact alone
    val (root, taxoJson, decisions) = loadGolden("manual_google300")
    val inputs = root.get("inputs").elements().asScala.map(_.asText()).toSeq
    val bases = root.get("bases").elements().asScala
      .map(_.elements().asScala.map(_.asLong()).toSeq).toSeq
    val m = new ObjectMapper()
    def jstr(s: String) = m.writeValueAsString(s)
    val cfgJson =
      s"""{"mode": "manual",
         |"input_concepts": [${inputs.map(jstr).mkString(",")}],
         |"manual_concept_bases": [${bases.map(_.mkString("[", ",", "]")).mkString(",")}],
         |"do_update": false}""".stripMargin
    val cfg = graft.core.ConfigLoader.iconFromString(cfgJson)
    val engine = new IconEngine(StubModels(), cfg)
    engine.run(TaxoJson.loadString(taxoJson))
    assertParity("manual_google300(config-file)", engine, root, decisions, inputs)
  }

  test("manual_google300_tolerance (tolerance=1, force paths) parity") {
    val (root, taxoJson, decisions) = loadGolden("manual_google300_tolerance")
    val inputs = root.get("inputs").elements().asScala.map(_.asText()).toSeq
    val engine = runManual(root, taxoJson, _.copy(tolerance = 1,
      forceBaseSubsumptions = true, forcePrune = true))
    assertParity("manual_google300_tolerance", engine, root, decisions, inputs)
  }

  test("manual_ebay_nonleaf (2311-node multi-parent eBay fixture) parity") {
    val (root, taxoJson, decisions) = loadGolden("manual_ebay_nonleaf")
    val inputs = root.get("inputs").elements().asScala.map(_.asText()).toSeq
    val engine = runManual(root, taxoJson)
    assertParity("manual_ebay_nonleaf", engine, root, decisions, inputs)
  }

  test("manual_multieqv (multi-equivalence resolution) parity") {
    val (root, taxoJson, decisions) = loadGolden("manual_multieqv")
    val inputs = root.get("inputs").elements().asScala.map(_.asText()).toSeq
    val engine = runManual(root, taxoJson)
    assertParity("manual_multieqv", engine, root, decisions, inputs)
  }

  test("semiauto_google300 (retrieval + generation) parity") {
    for (name <- Seq("semiauto_google300", "semiauto_google300_nofilter")) {
      val (root, taxoJson, decisions) = loadGolden(name)
      val seeds = longs(root, "seeds")
      val filterSubset = !name.endsWith("nofilter")
      val cfg = IconConfig(mode = "semiauto", semiautoSeeds = seeds,
        doUpdate = false, filterSubset = filterSubset)
      val engine = new IconEngine(StubModels(), cfg)
      engine.run(TaxoJson.loadString(taxoJson))
      val inputs = engine.logs.keys.toSeq ++ decisions.map(_.label)
      assertParity(name, engine, root, decisions, inputs.distinct)
    }
  }
}
