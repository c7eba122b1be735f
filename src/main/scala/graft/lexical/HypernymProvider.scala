package graft.lexical

/** Lexicon abstraction for the L2 hypernym helpers (tokenset_utils.py:
  * 93-112 walk WordNet; no JVM WordNet exists in this environment). A
  * synset is identified by an opaque string; `synsets` maps a word (and
  * optional POS) to its synsets, `hypernyms` gives a synset's direct
  * hypernym synsets. */
trait HypernymProvider extends Serializable {
  def synsets(word: String, pos: Option[String]): Seq[String]
  def hypernyms(synset: String): Seq[String]
}

object HypernymProvider {

  /** No-lexicon provider: `hypernym` degrades to equality and
    * `hypernymReduce` to identity — the engine's default behavior. */
  object Empty extends HypernymProvider {
    override def synsets(word: String, pos: Option[String]): Seq[String] = Nil
    override def hypernyms(synset: String): Seq[String] = Nil
  }

  /** Deterministic map-backed provider: each word is its own synset
    * (optionally POS-qualified as "word#pos"), hypernym edges from a static
    * map — the shape of KgPipeline.DomainHypernyms, usable for tests and
    * for domain taxonomies without WordNet. */
  final case class MapProvider(edges: Map[String, Seq[String]]) extends HypernymProvider {
    override def synsets(word: String, pos: Option[String]): Seq[String] =
      Seq(pos.filter(_.nonEmpty).map(p => s"$word#$p").getOrElse(word))
    override def hypernyms(synset: String): Seq[String] =
      edges.getOrElse(synset, Nil)
  }
}
