package graft.retrieve

/** Exact inner-product top-k index over concept vectors.
  *
  * The reference wraps FAISS (/root/reference/src/icon/utils/vector_index.py)
  * but only ever searches with exhaustive=True (icon.py:420,528;
  * category_move.py:265-268), i.e. nprobe = nlist = exact search — so exact
  * top-k IS the semantics to match and the IVF machinery is dead weight. This
  * driver-side twin serves the broadcast-sized taxonomy (≤ ~10^6 concepts);
  * corpus-scale retrieval goes through the distributed join path
  * (graft.similarity.Ann).
  *
  * Ordering: score descending, ties broken by id ascending (deterministic
  * across platforms; float64 accumulation).
  */
class VectorIndex(val ids: Array[Long], val vectors: Array[Array[Float]])
    extends SeedSearch with Serializable {
  require(ids.length == vectors.length)
  val dim: Int = if (vectors.isEmpty) 0 else vectors(0).length
  private val pos = scala.collection.mutable.HashMap[Long, Int](ids.zipWithIndex.toSeq: _*)

  def size: Int = ids.length
  def contains(id: Long): Boolean = pos.contains(id)

  def reconstruct(id: Long): Array[Float] = vectors(pos(id))

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** Exact top-k by inner product; `subset` restricts candidate ids
    * (vector_index.py:66-91 with exhaustive=True). Returns (scores, ids).
    * Bounded TopK selection, not a full sort — same (score desc, id asc)
    * order with zero per-entry allocation (a 50k-node snapshot sorted 50k
    * boxed tuples PER QUERY before). */
  def search(query: Array[Float], k: Int, subset: Option[Set[Long]]): (Array[Double], Array[Long]) = {
    val top = new TopK(k)
    subset match {
      case None =>
        var i = 0
        while (i < ids.length) { top.offer(dot(query, vectors(i)), ids(i)); i += 1 }
      case Some(s) =>
        var i = 0
        while (i < ids.length) {
          if (s.contains(ids(i))) top.offer(dot(query, vectors(i)), ids(i))
          i += 1
        }
    }
    top.result()
  }

  override def search(query: Array[Float], k: Int): (Array[Double], Array[Long]) =
    search(query, k, None)

  /** Bulk-synchronous rebuild helpers (R3: union / anti-join semantics —
    * the Spark engine recomputes the index per round, no in-place mutation). */
  def add(newIds: Array[Long], newVecs: Array[Array[Float]]): VectorIndex =
    new VectorIndex(ids ++ newIds, vectors ++ newVecs)

  def delete(gone: Set[Long]): VectorIndex = {
    val keep = ids.indices.filterNot(i => gone.contains(ids(i)))
    new VectorIndex(keep.map(ids).toArray, keep.map(vectors).toArray)
  }
}
