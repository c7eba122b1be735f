package graft

import graft.retrieve.{BandedIndex, TopK, VectorIndex}
import org.scalatest.funsuite.AnyFunSuite

/** Seed-retrieval indexes: exact VectorIndex (reference semantics,
  * vector_index.py exhaustive=True), the bounded TopK selection that
  * replaced its per-query full sort, and the banded RHP-LSH BandedIndex
  * the decide stage switches to above annNodeThreshold. */
class RetrieveSpec extends AnyFunSuite {

  private def vec(seed: Long, dim: Int = 64): Array[Float] = {
    // deterministic pseudo-random unit-ish vector (splitmix-style)
    var x = seed
    Array.fill(dim) {
      x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 33).toInt % 1000) / 1000.0f - 0.45f
    }
  }

  test("TopK selects (score desc, id asc) identically to a full sort") {
    val entries = (0 until 500).map { i =>
      (math.round(math.sin(i * 2.39) * 10) / 10.0, i.toLong) // many score ties
    }
    for (k <- Seq(1, 5, 17, 500, 600)) {
      val top = new TopK(math.min(k, 600))
      entries.foreach { case (s, i) => top.offer(s, i) }
      val (sc, id) = top.result()
      val expect = entries.sortBy { case (s, i) => (-s, i) }.take(k)
      assert(sc.toSeq == expect.map(_._1))
      assert(id.toSeq == expect.map(_._2))
    }
  }

  test("VectorIndex exact search matches naive sort incl. subset") {
    val ids = (0L until 300L).toArray
    val vs = ids.map(vec(_))
    val idx = new VectorIndex(ids, vs)
    val q = vec(999L)
    def dot(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val naive = ids.map(i => (dot(q, vs(i.toInt)), i)).sortBy { case (s, i) => (-s, i) }
    val (sc, id) = idx.search(q, 7)
    assert(id.toSeq == naive.take(7).map(_._2).toSeq)
    assert(sc.toSeq == naive.take(7).map(_._1).toSeq)
    val subset = Set(3L, 50L, 250L)
    val (_, idSub) = idx.search(q, 2, Some(subset))
    val naiveSub = naive.filter(e => subset.contains(e._2)).take(2).map(_._2)
    assert(idSub.toSeq == naiveSub.toSeq)
  }

  test("BandedIndex: an indexed vector retrieves itself first") {
    val n = 2000
    val ids = (0L until n.toLong).toArray
    val vs = ids.map(vec(_))
    val center = new Array[Double](64)
    val banded = new BandedIndex(ids, vs, center)
    var hit = 0
    for (i <- 0 until 100) {
      val (_, got) = banded.search(vs(i * 17), 3)
      if (got.nonEmpty && got(0) == ids(i * 17)) hit += 1
    }
    // the query IS in the index: identical signature, so every band
    // collides and the exact rerank must rank it first (cos with itself)
    assert(hit == 100)
  }

  test("BandedIndex recall vs exact on near-duplicate queries") {
    val n = 5000
    val ids = (0L until n.toLong).toArray
    val vs = ids.map(vec(_))
    val exact = new VectorIndex(ids, vs)
    val center = new Array[Double](64)
    val banded = new BandedIndex(ids, vs, center)
    // queries = slightly perturbed copies of indexed vectors: the
    // seed-retrieval regime the decide stage actually runs (a mention
    // embedding close to its concept's)
    var found = 0
    var total = 0
    for (i <- 0 until 200) {
      val base = vs(i * 23)
      val q = base.clone()
      q(0) += 0.01f; q(7) -= 0.01f
      val (_, ex) = exact.search(q, 5)
      val (_, ap) = banded.search(q, 5)
      val apSet = ap.toSet
      total += ex.length
      found += ex.count(apSet.contains)
    }
    // top-5 tails on UNIFORM RANDOM vectors are the worst case for any
    // bucketed method (the q32 IVF analysis, BENCH/BASELINE.md §7): the
    // 2nd-5th neighbors sit at cos ≈ 0.3 from the query, far outside any
    // band's collision range. The index's contract for the decide stage is
    // the near-self seed (a mention embedding close to its concept's),
    // asserted below; the top-5 floor only guards catastrophic breakage.
    val recall = found.toDouble / total
    assert(recall >= 0.15, s"near-dup seed recall $recall")
    val top1 = (0 until 200).count { i =>
      val base = vs(i * 23); val q = base.clone(); q(0) += 0.01f
      val (_, ap) = banded.search(q, 1)
      ap.nonEmpty && ap(0) == ids(i * 23)
    }
    assert(top1 >= 198, s"near-self top-1 hits $top1/200")
  }

  test("BandedIndex returns at most k and is deterministic") {
    val ids = (0L until 500L).toArray
    val vs = ids.map(vec(_))
    val banded = new BandedIndex(ids, vs, new Array[Double](64))
    val q = vec(424242L)
    val r1 = banded.search(q, 5)
    val r2 = banded.search(q, 5)
    assert(r1._2.length <= 5)
    assert(r1._1.toSeq == r2._1.toSeq && r1._2.toSeq == r2._2.toSeq)
  }

  test("BandedIndex with precomputed signatures searches identically to self-computed") {
    val ids = (0L until 800L).toArray
    val vs = ids.map(vec(_))
    val center = Array.tabulate(64)(i => math.sin(i) * 0.01)
    val self = new BandedIndex(ids, vs, center)
    val sg0 = new Array[Long](ids.length)
    val sg1 = new Array[Long](ids.length)
    for (i <- ids.indices) {
      val (a, b) = BandedIndex.signature(vs(i), center, 64)
      sg0(i) = a; sg1(i) = b
    }
    val pre = new BandedIndex(ids, vs, center, sg0, sg1)
    for (seed <- Seq(7L, 99L, 123456L, 777L)) {
      val q = vec(seed)
      assert(self.search(q, 8)._2.toSeq == pre.search(q, 8)._2.toSeq)
    }
  }

  test("SnapshotEmbeddings embeds only the delta and drops gone ids") {
    val cache = new graft.retrieve.SnapshotEmbeddings(8)
    def embed(ls: Seq[String]): Array[Array[Float]] =
      ls.map(l => Array.tabulate(8)(i => (l.hashCode * (i + 1)).toFloat)).toArray
    val ids1 = Array(1L, 2L, 3L)
    val v1 = cache.sync(ids1, Array("a", "b", "c"), embed)
    assert(cache.lastEmbedded == 3 && v1.length == 3)
    // second sync: node 2 gone, node 4 added — only "d" is embedded
    val ids2 = Array(1L, 3L, 4L)
    val v2 = cache.sync(ids2, Array("a", "c", "d"), ls => {
      assert(ls == Seq("d"), s"re-embedded $ls")
      embed(ls)
    })
    assert(cache.lastEmbedded == 1)
    assert(v2(0).toSeq == v1(0).toSeq && v2(1).toSeq == v1(2).toSeq)
    // signatures: cold pass signs everything, warm pass signs nothing
    cache.signatures(ids2, v2)
    assert(cache.lastSigned == 3)
    val (c1, a1, b1) = cache.signatures(ids2, v2)
    assert(cache.lastSigned == 0)
    // a new id under a stable center signs only itself, identically to a
    // from-scratch computation
    val ids3 = Array(1L, 3L, 4L, 5L)
    val v3 = cache.sync(ids3, Array("a", "c", "d", "e"), embed)
    val (c2, a2, b2) = cache.signatures(ids3, v3)
    assert(cache.lastSigned == 1)
    assert(c2.toSeq == c1.toSeq) // within drift ratio: center unchanged
    assert(a2.take(3).toSeq == a1.toSeq && b2.take(3).toSeq == b1.toSeq)
    val (ea, eb) = BandedIndex.signature(v3(3), c2, 8)
    assert(a2(3) == ea && b2(3) == eb)
    // crossover into distributed retrieval drops the cached payload (a run
    // that grew through the broadcast regime must not pin n·dim·4 B of
    // dead vectors on the driver) but keeps the frozen center, and a later
    // sync simply re-embeds from scratch
    cache.dropVectors()
    assert(cache.size == 0)
    assert(cache.currentCenter.exists(_.toSeq == c2.toSeq))
    val v4 = cache.sync(ids3, Array("a", "c", "d", "e"), embed)
    assert(cache.lastEmbedded == 4 && v4(0).toSeq == v3(0).toSeq)
  }

  test("restoreCenter rejects a center persisted at a different embedding width") {
    val cache = new graft.retrieve.SnapshotEmbeddings(768)
    val e = intercept[IllegalArgumentException] {
      cache.restoreCenter(Array.fill(64)(0.0), 10)
    }
    assert(e.getMessage.contains("width 64"))
  }

  test("BandedIndex.signature fails fast on vectors wider than the plane table") {
    // ADVICE r5: the column kernel (RhpSigExpr) fails fast on wide rows;
    // the driver twin silently truncated — they must surface mixed-width
    // inputs identically
    val e = intercept[IllegalArgumentException] {
      graft.retrieve.BandedIndex.signature(
        Array.fill(128)(1.0f), Array.fill(64)(0.0), 64)
    }
    assert(e.getMessage.contains("128-dim"))
    // narrow vectors keep the documented missing-dim-reads-as-center rule
    val (w0, w1) = graft.retrieve.BandedIndex.signature(
      Array.fill(32)(1.0f), Array.fill(64)(0.0), 64)
    assert(w0 != 0L || w1 != 0L)
  }
}
