package graft

import graft.ops.MediaOps
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing: schema, batched decode, resize,
  * frame sampling — with the deterministic stub codec. */
class MediaSpec extends SparkSpecBase {
  import spark.implicits._

  test("synthetic media generation is deterministic across parallelism") {
    val a = MediaOps.synthMedia(spark, 60, 1).collect().sortBy(_.mediaId)
    val b = MediaOps.synthMedia(spark, 60, 5).collect().sortBy(_.mediaId)
    assert(a.map(_.payload.toSeq).toSeq == b.map(_.payload.toSeq).toSeq)
  }

  test("batched feature extraction yields 64-dim grids with sane luma") {
    val feats = MediaOps.extractFeatures(MediaOps.synthMedia(spark, 50, 4)).collect()
    assert(feats.length == 50)
    assert(feats.forall(_.feature.length == 64))
    assert(feats.forall(f => f.meanLuma >= 0 && f.meanLuma <= 255))
    // deterministic: same id ⇒ same feature on re-run
    val again = MediaOps.extractFeatures(MediaOps.synthMedia(spark, 50, 2)).collect()
    assert(feats.sortBy(_.mediaId).map(_.feature.toSeq).toSeq ==
      again.sortBy(_.mediaId).map(_.feature.toSeq).toSeq)
  }

  test("resize re-encodes to target dimensions") {
    val resized = MediaOps.resize(MediaOps.synthMedia(spark, 20, 2), 16, 16).collect()
    assert(resized.forall(r => r.width == 16 && r.height == 16))
    assert(resized.forall(r => r.payload.length == 7 + 256))
    val (w, h, _, px) = MediaOps.StubCodec.decode(resized.head.payload)
    assert(w == 16 && h == 16 && px.length == 256)
  }

  test("frame sampling keeps every 2nd frame of video rows only") {
    val media = MediaOps.synthMedia(spark, 30, 2).toDF()
    val frames = MediaOps.sampleFrames(media, 2)
      .as[(Long, Int)].collect().groupBy(_._1)
    assert(frames.nonEmpty)
    for ((id, fs) <- frames) {
      assert(id % 3 == 2) // only video rows
      assert(fs.map(_._2).forall(_ % 2 == 0))
    }
  }
}
