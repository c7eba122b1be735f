package graft.models

import graft.lexical.Tokenset

/** The three pluggable model interfaces of the reference
  * (/root/reference/README.md:29-39 — "ICON uses its sub-models as callable
  * functions and doesn't care how the models themselves are implemented").
  * All are batched (reference batch size 64, demo.ipynb cell 8); in the Spark
  * engine they are invoked executor-side inside `mapPartitions`, one instance
  * per task, so they must be Serializable and thread-free.
  */
trait Embedder extends Serializable {
  def dim: Int
  /** Batch sentence embedding (reference emb_model, M1). */
  def embed(labels: Seq[String]): Array[Array[Float]]
  def embedOne(label: String): Array[Float] = embed(Seq(label)).head
  /** Chunked batch embedding at the reference's batch size (demo.ipynb
    * cell 8, batch_size 64): every pipeline hot path goes through this —
    * with a real BERT-style embedder one model invocation per ≤64 labels
    * is the contract, never one per row. */
  def embedBatched(labels: Seq[String], batchSize: Int = 64): Array[Array[Float]] =
    if (labels.isEmpty) Array.empty
    else labels.grouped(batchSize).flatMap(g => embed(g)).toArray
}

trait Generator extends Serializable {
  /** Union-label generation for a concept subset (reference gen_model, M2). */
  def generate(labels: Seq[String]): String
}

trait SubScorer extends Serializable {
  /** P(sup subsumes sub) per pair in [0,1] (reference sub_model, M3). */
  def score(pairs: Seq[(String, String)]): Array[Double]
  def scoreOne(sub: String, sup: String): Double = score(Seq((sub, sup))).head
}

case class IconModels(emb: Embedder, gen: Generator, sub: SubScorer) extends Serializable

/** Deterministic stub embedder: signed char-3-gram hashing into `dim`
  * buckets with integer accumulation, then L2 normalization in float64 →
  * float32. Integer pre-normalization counts make the Python twin
  * (tools/golden_gen.py) bit-compatible for ranking purposes.
  */
class HashNgramEmbedder(val dim: Int = 64) extends Embedder {
  require(dim > 0, s"embedding dim must be positive, got $dim (check GRAFT_EMB_DIM)")
  def embed(labels: Seq[String]): Array[Array[Float]] = labels.iterator.map { label =>
    val counts = new Array[Long](dim)
    val s = "^" + (if (label == null) "" else label.toLowerCase) + "$"
    var i = 0
    while (i + 3 <= s.length) {
      val h = Tokenset.fnv1a64(s.substring(i, i + 3))
      val idx = java.lang.Long.remainderUnsigned(h, dim.toLong).toInt
      val sign = if (((h >>> 32) & 1L) == 0L) 1L else -1L
      counts(idx) += sign
      i += 1
    }
    val norm = math.sqrt(counts.iterator.map(c => c.toDouble * c).sum)
    val out = new Array[Float](dim)
    if (norm > 0) {
      var j = 0
      while (j < dim) { out(j) = (counts(j) / norm).toFloat; j += 1 }
    }
    out
  }.toArray
}

/** Deterministic stub subsumption scorer: squared token containment over the
  * engine tokenset. P(sup subsumes sub) = (|tokens(sup) ∩ tokens(sub)| /
  * |tokens(sup)|)² — 1.0 when every sup token appears in sub ("pet dog" ⊑
  * "dog" scores 1.0); partial overlaps are damped below the default 0.5
  * threshold so single-shared-token pairs don't spuriously subsume. Exact
  * rational→double arithmetic keeps the Python twin bit-identical.
  */
class TokenContainmentScorer(hypernyms: Map[String, Set[String]] = Map.empty) extends SubScorer {
  /** sup token t "covers" the sub token set when t appears in it directly or
    * t is a known hypernym of some sub token (optional static table — lets
    * the stub place "hash join" under an abstract "operation" node). */
  private def covers(t: String, ts: Set[String]): Boolean =
    ts.contains(t) || ts.exists(s => hypernyms.getOrElse(s, Set.empty).contains(t))

  def score(pairs: Seq[(String, String)]): Array[Double] = pairs.iterator.map { case (sub, sup) =>
    val ts = Tokenset.tokens(sub).toSet
    val tp = Tokenset.tokens(sup)
    if (tp.isEmpty) 0.0
    else {
      val f = tp.count(covers(_, ts)).toDouble / tp.size
      f * f
    }
  }.toArray
}

/** Deterministic stub generator: common tokens of the input labels joined in
  * first-label order; when no common token exists, all distinct tokens in
  * order of first appearance. Mirrors the reference gen_model's union-label
  * role (M2) without a seq2seq model.
  */
class CommonTokenGenerator extends Generator {
  def generate(labels: Seq[String]): String = {
    val tokenSeqs = labels.map(Tokenset.tokens)
    if (tokenSeqs.isEmpty) return ""
    val common = tokenSeqs.head.filter(t => tokenSeqs.tail.forall(_.contains(t)))
    if (common.nonEmpty) common.mkString(" ")
    else {
      val seen = scala.collection.mutable.LinkedHashSet.empty[String]
      tokenSeqs.foreach(seen ++= _)
      seen.mkString(" ")
    }
  }
}

object StubModels {
  def apply(dim: Int = 64): IconModels =
    IconModels(new HashNgramEmbedder(dim), new CommonTokenGenerator, new TokenContainmentScorer)
}
