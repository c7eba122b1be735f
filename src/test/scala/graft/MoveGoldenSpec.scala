package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.core.{CategoryMoveEngine, MoveConfig}
import graft.models.StubModels
import graft.taxo.TaxoJson
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Category-move decision parity vs the reference (C1-C9). */
class MoveGoldenSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def loadGolden(name: String) = {
    val in = getClass.getResourceAsStream(s"/goldens/$name.json")
    require(in != null, s"missing golden $name")
    mapper.readTree(in)
  }

  private def runMove(method: String, name: String): Unit = {
    val root = loadGolden(name)
    val taxo = TaxoJson.loadString(root.get("taxonomy").toString)
    val engine = new CategoryMoveEngine(StubModels(),
      MoveConfig(mode = "auto", method = method, maxOuterLoop = Some(15), doUpdate = true))
    val result = engine.run(taxo)
    val golden = root.get("decisions").elements().asScala
      .map(d => d.get("target").asLong() ->
        d.get("winner").elements().asScala.map(_.asLong()).toSet).toMap
    val mine = engine.logs.map { case (k, v) => k -> v.toSet }.toMap
    val matches = golden.count { case (t, w) => mine.get(t).contains(w) }
    val p = matches.toDouble / math.max(mine.size, 1)
    val r = matches.toDouble / math.max(golden.size, 1)
    info(f"$name: precision=$p%.4f recall=$r%.4f (golden=${golden.size} mine=${mine.size})")
    assert(p >= 0.95 && r >= 0.95, s"$name P/R below 0.95: p=$p r=$r")
    assert(engine.kept == root.get("kept").asLong())
    assert(engine.moved == root.get("moved").asLong())
    if (root.has("final_edges")) {
      val wantEdges = root.get("final_edges").elements().asScala
        .map(e => (e.get(0).asLong(), e.get(1).asLong(), e.get(2).asText())).toSet
      assert(result.edges.toSet == wantEdges)
    }
  }

  test("category move (search method) matches the reference") {
    runMove("search", "move_search_google300")
  }

  test("category move (rag method) matches the reference") {
    runMove("rag", "move_rag_google300")
  }
}
