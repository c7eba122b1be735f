package graft

import graft.core.{IconConfig, IconEngine}
import graft.models.StubModels
import graft.taxo.TaxoJson

/** Minimal CLI slice (SURVEY.md §7.3): load a taxonomy JSON, place new
  * concept labels in manual mode with the deterministic stub models, print
  * the placement decisions and emitted triples.
  *
  * Usage: runMain graft.Demo <taxonomy.json> <label1> [label2 ...]
  */
object Demo {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Demo <taxonomy.json> <label> [label ...]")
    val taxo = TaxoJson.load(args(0))
    val labels = args.drop(1).toSeq
    println(s"Loaded $taxo")
    val engine = new IconEngine(StubModels(),
      IconConfig(mode = "manual", inputConcepts = labels))
    val result = engine.run(taxo)
    for ((label, d) <- engine.logs) {
      val eqvStr = d.eqv.map { case (n, p) => f"eqv=${result.getLabel(n)}($n) p=$p%.4f" }.getOrElse("")
      val supStr = d.sup.map { case (n, p) => f"${result.getLabel(n)}($n) p=$p%.2f" }.mkString(",")
      val subStr = d.sub.map { case (n, p) => f"${result.getLabel(n)}($n) p=$p%.2f" }.mkString(",")
      println(s"decision: '$label' $eqvStr sup=[$supStr] sub=[$subStr]")
    }
    println(s"Result: $result (+${engine.progress._1} classes, +${engine.progress._2} edges)")
    for ((s, p, o) <- engine.triples(taxo)) println(s"triple: ($s, $p, $o)")
  }
}
