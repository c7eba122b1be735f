package graft.retrieve

import scala.collection.mutable

/** Cross-round cache of snapshot-node embeddings and RHP signatures for the
  * pipeline's decide-stage seed index (SURVEY.md R3/R5 made incremental).
  *
  * The reference's vector store supports incremental add/delete
  * (/root/reference/src/icon/utils/vector_index.py:93-121) and ICON keeps
  * one index per taxonomy snapshot; the round-3 engine rebuilt the decide
  * index from scratch every round — 10⁶ re-embeddings plus an O(n·bits·dim)
  * signature rebuild for a ~10²-node per-round delta. This cache keys
  * embeddings by node id (labels are immutable once minted, so an id's
  * embedding never changes) and re-embeds only ids the snapshot gained;
  * ids the snapshot lost (canonicalize merges) are dropped.
  *
  * RHP signatures are cached alongside, computed against a frozen `center`:
  * recentering invalidates every cached signature, so the center is only
  * recomputed when the snapshot has grown or shrunk past `RecenterRatio`
  * since it was last set (amortized O(log growth) full signature rebuilds
  * over a run). The center is tiny (dim doubles) and is persisted with the
  * round checkpoint so a resumed run probes identical buckets — bit-identical
  * kill+resume includes the ANN decide path.
  */
final class SnapshotEmbeddings(val dim: Int) extends Serializable {
  import SnapshotEmbeddings.RecenterRatio

  private val vecs = mutable.HashMap.empty[Long, Array[Float]]
  private val s0 = mutable.HashMap.empty[Long, Long]
  private val s1 = mutable.HashMap.empty[Long, Long]
  private var center: Array[Double] = null
  private var centerN: Int = 0

  /** Telemetry for the decide-phase lineage row: labels actually embedded
    * (the per-round delta) and signatures actually computed in the last
    * sync — the evidence surface that index build cost tracks the delta. */
  var lastEmbedded: Int = 0
  var lastSigned: Int = 0

  def size: Int = vecs.size
  def currentCenter: Option[Array[Double]] = Option(center)
  def centerSnapshotSize: Int = centerN

  /** Restore a persisted center (resume path). */
  def restoreCenter(c: Array[Double], n: Int): Unit = {
    // a center persisted at a different embedding width means the
    // checkpoint was written under another GRAFT_EMB_DIM: probing a
    // wide store with narrow planes (or vice versa) silently empties
    // every bucket, so fail fast instead
    require(c.length == dim,
      s"checkpointed RHP center has width ${c.length} but the embedder is " +
        s"$dim-dim — resume with the embedding width the checkpoint was written at")
    center = c; centerN = n
    s0.clear(); s1.clear()
  }

  /** Drop every cached vector and signature, keeping only the (tiny)
    * frozen center. Called when the pipeline crosses into distributed
    * retrieval: from that point vectors live in the checkpointed
    * (id, embedding) store and this cache is never synced again — without
    * the drop, up to distributedRetrieveNodes·dim·4 B of vectors pinned
    * here would ride along as dead driver heap for the rest of the run
    * (~6 GB at 2M×768-dim), undercutting the regime's whole point. */
  def dropVectors(): Unit = {
    vecs.clear(); s0.clear(); s1.clear()
  }

  /** Seed embeddings computed elsewhere (the canonicalize stage embeds
    * every minted concept anyway — without this, the next round's sync
    * re-embeds the same labels: a duplicated full model pass per round
    * with a real encoder). Ids later absent from the snapshot are dropped
    * by the next sync. */
  def preload(ids: Array[Long], vs: Array[Array[Float]]): Unit = {
    var i = 0
    while (i < ids.length) { vecs(ids(i)) = vs(i); i += 1 }
  }

  /** Align the cache with the snapshot's node set: drop ids the snapshot
    * lost, embed (via `embedBatch`, which receives ONLY the missing labels,
    * in snapshot order) ids it gained. Returns the vectors aligned to
    * `nodeIds` order. */
  def sync(nodeIds: Array[Long], labels: Array[String],
           embedBatch: Seq[String] => Array[Array[Float]]): Array[Array[Float]] = {
    val present = new java.util.HashSet[Long]()
    nodeIds.foreach(present.add)
    val gone = vecs.keysIterator.filterNot(present.contains).toArray
    for (k <- gone) { vecs -= k; s0 -= k; s1 -= k }
    val missing = nodeIds.indices.filter(i => !vecs.contains(nodeIds(i)))
    lastEmbedded = missing.size
    lastSigned = 0 // stays 0 unless signatures() runs (exact-index path)
    if (missing.nonEmpty) {
      val fresh = embedBatch(missing.map(labels))
      var i = 0
      while (i < missing.length) { vecs(nodeIds(missing(i))) = fresh(i); i += 1 }
    }
    nodeIds.map(vecs)
  }

  /** Signatures aligned to `nodeIds`, computing only the ids without a
    * cached signature under the current center; recenters (and recomputes
    * everything) when the snapshot drifted past RecenterRatio. `aligned`
    * must be the sync() output for the same `nodeIds`. */
  def signatures(nodeIds: Array[Long],
                 aligned: Array[Array[Float]]): (Array[Double], Array[Long], Array[Long]) = {
    val n = nodeIds.length
    if (center == null || n > centerN * RecenterRatio || n * RecenterRatio < centerN) {
      val c = new Array[Double](dim)
      for (v <- aligned; i <- c.indices if i < v.length) c(i) += v(i)
      for (i <- c.indices) c(i) /= math.max(1, n)
      restoreCenter(c, n)
    }
    val sig0 = new Array[Long](n)
    val sig1 = new Array[Long](n)
    val todo = mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < n) {
      s0.get(nodeIds(i)) match {
        case Some(a) => sig0(i) = a; sig1(i) = s1(nodeIds(i))
        case None => todo += i
      }
      i += 1
    }
    lastSigned = todo.size
    if (todo.nonEmpty) {
      val idx = todo.toArray
      val c = center
      java.util.stream.IntStream.range(0, idx.length).parallel().forEach { j =>
        val k = idx(j)
        val (a, b) = BandedIndex.signature(aligned(k), c, dim)
        sig0(k) = a; sig1(k) = b
      }
      for (k <- idx) { s0(nodeIds(k)) = sig0(k); s1(nodeIds(k)) = sig1(k) }
    }
    (center, sig0, sig1)
  }
}

object SnapshotEmbeddings {
  /** Snapshot-size drift beyond which the RHP center is recomputed and all
    * cached signatures invalidated. */
  val RecenterRatio = 1.5
}
