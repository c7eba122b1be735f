package graft

import graft.ops.TrainDataOps
import org.apache.spark.sql.functions._

/** T1 negative-pool derivation: the pool must come from the graph shape
  * (internal nodes), not from the fixture's id convention (the round-3
  * `id < 1000` assumption fed a crossJoin). */
class TrainDataSpec extends SparkSpecBase {

  test("subsData negatives derive from internal nodes on a relabeled-id taxonomy") {
    import spark.implicits._
    // ids deliberately far outside the fixture's `< 1000` convention
    val off = 5000000L
    val edges = Seq(
      (off + 10, off + 1), (off + 11, off + 1), (off + 20, off + 2),
      (off + 21, off + 2), (off + 1, off), (off + 2, off)).toDF("src", "dst")
    val nodes = Seq(
      (off, "root"), (off + 1, "a"), (off + 2, "b"), (off + 10, "a1"),
      (off + 11, "a2"), (off + 20, "b1"), (off + 21, "b2")).toDF("id", "label")
    val out = TrainDataOps.subsDataFrom(edges, nodes)
    val internal = Set(off, off + 1, off + 2)
    val ancestors = Map( // transitive closure of the toy taxonomy
      off -> Set.empty[Long],
      (off + 1) -> Set(off), (off + 2) -> Set(off),
      (off + 10) -> Set(off + 1, off), (off + 11) -> Set(off + 1, off),
      (off + 20) -> Set(off + 2, off), (off + 21) -> Set(off + 2, off))
    val negatives = out.filter(col("labels") === 0)
      .select("node", "anc").as[(Long, Long)].collect()
    // one negative per node; drawn from the internal pool; never a true
    // ancestor and never the node itself
    assert(negatives.length == 7, s"got ${negatives.toSeq}")
    assert(negatives.map(_._1).distinct.length == 7)
    for ((n, a) <- negatives) {
      assert(internal.contains(a), s"negative anchor $a not an internal node")
      assert(a != n && !ancestors(n).contains(a), s"negative ($n,$a) is a true ancestor")
    }
    // positives unchanged by the pool derivation: 1-hop (6) + 2-hop (4)
    assert(out.filter(col("labels") === 1).count() == 10)
  }
}
