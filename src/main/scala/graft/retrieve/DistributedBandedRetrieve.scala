package graft.retrieve

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Distributed twin of [[BandedIndex]] probe + rerank for snapshots beyond
  * the broadcast-index regime (SURVEY.md §7.1 step 3 at 10⁷⁺ concepts).
  *
  * The driver [[BandedIndex]] holds every snapshot vector (n·dim·4 B) and
  * its signatures on the driver and ships a full copy to every executor as
  * a broadcast — fine at 10⁶×64-dim (~256 MB), ~3 GB at a real encoder's
  * 768-dim, fatal at 10⁷⁺. This twin keeps the vectors DISTRIBUTED (an
  * (id, embedding) DataFrame maintained incrementally by the pipeline
  * checkpoint) and expresses the same probe as a bucket cogroup:
  *
  *   1. both sides are signed with the SAME 128-bit RHP family and frozen
  *      center ([[BandedIndex.signature]] — bucket parity with the driver
  *      index is by construction, the code is shared);
  *   2. each vector is exploded to its 8 (band, 16-bit bucket) keys;
  *   3. a cogroup on the packed band-bucket key computes exact dot-product
  *      rerank WITHIN each bucket and emits only each query's per-bucket
  *      top-k (a node in the global top-k is top-k in every bucket it
  *      shares with the query — fewer than k nodes outscore it anywhere —
  *      so per-bucket truncation loses nothing);
  *   4. a final groupBy(query) dedupes multi-band collisions by id and
  *      merges per-bucket lists into the global (score desc, id asc) top-k
  *      — the exact [[TopK]] ordering the driver twin uses.
  *
  * Shuffle cost is O((n + m)·bands) rows of (key, id, vec) plus the skinny
  * (query, id, score) rerank rows — the vector payload is never joined
  * per candidate PAIR (at 10⁶ candidates × ~10²-per-query collisions a
  * pair-level vector join would shuffle hundreds of GB; the cogroup ships
  * each vector `bands` times regardless of collision count).
  */
object DistributedBandedRetrieve {
  import BandedIndex.{Bands, bandBucket, dot}

  /** Per-bucket node cap (see the cogroup comment): ~50-400× the expected
    * occupancy at 10⁷ nodes, bounding a degenerate bucket's task memory
    * at MaxBucketNodes·dim·4 B. */
  val MaxBucketNodes = 65536

  /** Top-k seed retrieval: `(mention, seeds: Array[Long])` per candidate,
    * seeds in (score desc, id asc) rank order — [[BandedIndex.search]]
    * semantics, possibly fewer than k (empty buckets are the documented
    * at-scale approximation). Candidates landing in no bucket at all are
    * absent from the output (join left-outer and treat null as empty). */
  def seeds(spark: SparkSession, candVecs: DataFrame, nodeVecs: DataFrame,
            center: Array[Double], dim: Int, k: Int): DataFrame = {
    import spark.implicits._
    val bCenter = spark.sparkContext.broadcast(center)
    val nodeKeyed = nodeVecs.as[(Long, Array[Float])].flatMap { case (id, v) =>
      val (w0, w1) = BandedIndex.signature(v, bCenter.value, dim)
      (0 until Bands).iterator.map(b => ((b << 16) | bandBucket(w0, w1, b), id, v))
    }
    val candKeyed = candVecs.as[(String, Array[Float])].flatMap { case (m, q) =>
      val (w0, w1) = BandedIndex.signature(q, bCenter.value, dim)
      (0 until Bands).iterator.map(b => ((b << 16) | bandBucket(w0, w1, b), m, q))
    }
    val perBucket = candKeyed.groupByKey(_._1).cogroup(nodeKeyed.groupByKey(_._1)) {
      (_, qs, ns) =>
        // most node buckets contain no query at all (node keys occupy up
        // to bands·2¹⁶ buckets, query keys at most m·bands) — skip the
        // heap entirely for them; hasNext does not consume the iterator
        if (!qs.hasNext) Iterator.empty
        else {
          // bounded bucket materialization (skew guard, the maxShingleFreq/
          // maxBucketSize pattern): a degenerate bucket — many near-identical
          // embeddings sharing one signature — would otherwise buffer an
          // unbounded fraction of the snapshot's vectors in one task. Retain
          // the MaxBucketNodes smallest-id members (bounded max-heap by id:
          // DETERMINISTIC regardless of cogroup arrival order, unlike a
          // take()-style truncation). Expected occupancy is n·bands/2¹⁶
          // (~10²-10³ at 10⁷ nodes) — only degenerate buckets hit the cap,
          // and truncation there is the same documented approximation class
          // as an empty-bucket miss.
          val heap = new java.util.PriorityQueue[(Long, Array[Float])](
            16, (a: (Long, Array[Float]), b: (Long, Array[Float])) =>
              java.lang.Long.compare(b._1, a._1))
          for ((_, id, v) <- ns) {
            if (heap.size < MaxBucketNodes) heap.add((id, v))
            else if (id < heap.peek()._1) { heap.poll(); heap.add((id, v)) }
          }
          if (heap.isEmpty) Iterator.empty
          else {
            val nodes = heap.toArray(Array.empty[(Long, Array[Float])])
            qs.flatMap { case (_, m, q) =>
              val top = new TopK(k)
              var i = 0
              while (i < nodes.length) {
                top.offer(dot(q, nodes(i)._2), nodes(i)._1)
                i += 1
              }
              val (sc, id) = top.result()
              id.indices.iterator.map(j => (m, id(j), sc(j)))
            }
          }
        }
    }
    perBucket.groupByKey(_._1).mapGroups { (m, rows) =>
      // multi-band collisions re-score the same (query, node) pair with
      // the IDENTICAL dot product — dedupe by id before the global merge
      val seen = new java.util.HashSet[Long]()
      val top = new TopK(k)
      for ((_, id, sc) <- rows) if (seen.add(id)) top.offer(sc, id)
      (m, top.result()._2)
    }.toDF("mention", "seeds")
  }
}
