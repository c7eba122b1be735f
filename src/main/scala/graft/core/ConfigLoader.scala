package graft.core

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Config-file loading for [[IconConfig]] and [[MoveConfig]] — the Spark
  * twin of the reference's `icon_config_from_dict` / `icon_config_from_yaml`
  * (config.py:175-230): flat leaf names (snake_case, as the reference
  * accepts, or camelCase) populate the config; unknown keys are ignored
  * (reference: `except KeyError: pass`). JSON instead of YAML — the engine
  * carries no YAML dependency, and a JSON artifact reproduces a run the
  * same way the reference's YAML does.
  */
object ConfigLoader {
  private val mapper = new ObjectMapper()

  def iconFromFile(path: String): IconConfig =
    iconFromNode(mapper.readTree(Files.readAllBytes(Paths.get(path))))
  def iconFromString(json: String): IconConfig = iconFromNode(mapper.readTree(json))

  def moveFromFile(path: String): MoveConfig =
    moveFromNode(mapper.readTree(Files.readAllBytes(Paths.get(path))))
  def moveFromString(json: String): MoveConfig = moveFromNode(mapper.readTree(json))

  private def field(n: JsonNode, names: String*): Option[JsonNode] =
    names.iterator.map(n.get).find(v => v != null && !v.isNull)

  private def str(n: JsonNode, d: String, names: String*): String =
    field(n, names: _*).map(_.asText).getOrElse(d)
  private def bool(n: JsonNode, d: Boolean, names: String*): Boolean =
    field(n, names: _*).map(_.asBoolean).getOrElse(d)
  private def int(n: JsonNode, d: Int, names: String*): Int =
    field(n, names: _*).map(_.asInt).getOrElse(d)
  private def dbl(n: JsonNode, d: Double, names: String*): Double =
    field(n, names: _*).map(_.asDouble).getOrElse(d)
  private def lng(n: JsonNode, d: Long, names: String*): Long =
    field(n, names: _*).map(_.asLong).getOrElse(d)
  private def optInt(n: JsonNode, names: String*): Option[Int] =
    field(n, names: _*).map(_.asInt)
  private def longs(n: JsonNode, names: String*): Option[Seq[Long]] =
    field(n, names: _*).map(_.elements.asScala.map(_.asLong).toSeq)
  private def strings(n: JsonNode, names: String*): Option[Seq[String]] =
    field(n, names: _*).map(_.elements.asScala.map(_.asText).toSeq)
  private def doubles(n: JsonNode, names: String*): Option[Seq[Double]] =
    field(n, names: _*).map(_.elements.asScala.map(_.asDouble).toSeq)

  def iconFromNode(n: JsonNode): IconConfig = {
    val d = IconConfig()
    IconConfig(
      mode = str(n, d.mode, "mode"),
      maxOuterLoop = optInt(n, "max_outer_loop", "maxOuterLoop"),
      semiautoSeeds = longs(n, "semiauto_seeds", "semiautoSeeds").getOrElse(d.semiautoSeeds),
      inputConcepts = strings(n, "input_concepts", "inputConcepts").getOrElse(d.inputConcepts),
      manualConceptBases = field(n, "manual_concept_bases", "manualConceptBases")
        .map(_.elements.asScala.map(_.elements.asScala.map(_.asLong).toSeq).toSeq),
      autoBases = bool(n, d.autoBases, "auto_bases", "autoBases"),
      randSeed = lng(n, d.randSeed, "rand_seed", "randSeed"),
      retrieveSize = int(n, d.retrieveSize, "retrieve_size", "retrieveSize"),
      restrictCombinations = bool(n, d.restrictCombinations, "restrict_combinations", "restrictCombinations"),
      ignoreLabel = strings(n, "ignore_label", "ignoreLabel").getOrElse(d.ignoreLabel),
      filterSubset = bool(n, d.filterSubset, "filter_subset", "filterSubset"),
      subgraphCrop = bool(n, d.subgraphCrop, "subgraph_crop", "subgraphCrop"),
      subgraphForce = field(n, "subgraph_force", "subgraphForce")
        .map(_.elements.asScala.map(_.elements.asScala.map(_.asText).toSet).toSeq)
        .getOrElse(d.subgraphForce),
      subgraphStrict = bool(n, d.subgraphStrict, "subgraph_strict", "subgraphStrict"),
      threshold = dbl(n, d.threshold, "threshold"),
      tolerance = int(n, d.tolerance, "tolerance"),
      forceBaseSubsumptions = bool(n, d.forceBaseSubsumptions, "force_base_subsumptions", "forceBaseSubsumptions"),
      forcePrune = bool(n, d.forcePrune, "force_prune", "forcePrune"),
      doUpdate = bool(n, d.doUpdate, "do_update", "doUpdate"),
      doLexicalCheck = bool(n, d.doLexicalCheck, "do_lexical_check", "doLexicalCheck"),
      transitiveReduction = bool(n, d.transitiveReduction, "transitive_reduction", "transitiveReduction"),
      // engine extension (no reference twin): without it a config artifact
      // could not reproduce a scale-guarded run — the guard would silently
      // stay at Int.MaxValue and the search-space build degenerates to
      // whole-graph copies on large flat taxonomies
      maxChildFanout = int(n, d.maxChildFanout, "max_child_fanout", "maxChildFanout"))
  }

  def moveFromNode(n: JsonNode): MoveConfig = {
    val d = MoveConfig()
    MoveConfig(
      mode = str(n, d.mode, "mode"),
      method = str(n, d.method, "method"),
      maxOuterLoop = optInt(n, "max_outer_loop", "maxOuterLoop"),
      ignore = longs(n, "ignore").map(_.toSet).getOrElse(d.ignore),
      inputConcepts = longs(n, "input_concepts", "inputConcepts").getOrElse(d.inputConcepts),
      retrieveSize = int(n, d.retrieveSize, "retrieve_size", "retrieveSize"),
      candidateTopLevel = int(n, d.candidateTopLevel, "candidate_top_level", "candidateTopLevel"),
      candidateBottomLevel = int(n, d.candidateBottomLevel, "candidate_bottom_level", "candidateBottomLevel"),
      retIgnore = longs(n, "ret_ignore", "retIgnore").map(_.toSet).getOrElse(d.retIgnore),
      scopeTopLevel = int(n, d.scopeTopLevel, "scope_top_level", "scopeTopLevel"),
      scopeBottomLevel = int(n, d.scopeBottomLevel, "scope_bottom_level", "scopeBottomLevel"),
      threshold = dbl(n, d.threshold, "threshold"),
      tolerance = int(n, d.tolerance, "tolerance"),
      forcePrune = bool(n, d.forcePrune, "force_prune", "forcePrune"),
      alwaysSearchToBottom = bool(n, d.alwaysSearchToBottom, "always_search_to_bottom", "alwaysSearchToBottom"),
      doSelect = bool(n, d.doSelect, "do_select", "doSelect"),
      alwaysIncludeOld = bool(n, d.alwaysIncludeOld, "always_include_old", "alwaysIncludeOld"),
      selectionFeatures = strings(n, "selection_features", "selectionFeatures").getOrElse(d.selectionFeatures),
      weights = doubles(n, "weights").getOrElse(d.weights),
      doUpdate = bool(n, d.doUpdate, "do_update", "doUpdate"))
  }
}
