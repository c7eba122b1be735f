package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: image/audio/video as opaque BINARY columns
  * with typed metadata, processed in executor-side batches (the Scala
  * analogue of mapInPandas — typed Dataset mapPartitions with batched
  * per-partition decode).
  *
  * The container has no image/audio codecs, so decode is a clearly-marked
  * deterministic STUB (`StubCodec`): it parses our synthetic media header
  * and derives pixels/samples from a hash stream. The Spark-side plumbing —
  * schema, binary transport, partitioning, batch shape, feature extraction,
  * resize, frame sampling — is real and tested (MediaSpec).
  */
object MediaOps {

  case class MediaMeta(mediaId: Long, kind: String, width: Int, height: Int,
                       frames: Int, sampleRate: Int)
  case class MediaRow(mediaId: Long, kind: String, payload: Array[Byte],
                      width: Int, height: Int, frames: Int)
  case class MediaFeature(mediaId: Long, kind: String, feature: Array[Float],
                          nFrames: Int, meanLuma: Double)

  /** Deterministic fake codec — STAND-IN for a real image/audio library
    * (none available offline). Header: [kind:1][width:2][height:2][frames:2];
    * body bytes are the "pixels". A real deployment swaps this object for
    * JPEG/PNG/PCM decoders with the identical interface. */
  object StubCodec extends Serializable {
    def encode(meta: MediaMeta, seed: Long): Array[Byte] = {
      val body = new Array[Byte](math.min(meta.width * meta.height, 4096))
      var h = seed * 0x9E3779B97F4A7C15L + 1
      var i = 0
      while (i < body.length) {
        h = h * 6364136223846793005L + 1442695040888963407L
        body(i) = (h >>> 56).toByte
        i += 1
      }
      val head = Array[Byte](
        meta.kind.headOption.getOrElse('i').toByte,
        (meta.width >> 8).toByte, meta.width.toByte,
        (meta.height >> 8).toByte, meta.height.toByte,
        (meta.frames >> 8).toByte, meta.frames.toByte)
      head ++ body
    }

    /** "Decode": header parse + body as luma plane. ??? in a real build. */
    def decode(payload: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
      require(payload.length >= 7, "truncated media payload")
      val w = ((payload(1) & 0xff) << 8) | (payload(2) & 0xff)
      val h = ((payload(3) & 0xff) << 8) | (payload(4) & 0xff)
      val f = ((payload(5) & 0xff) << 8) | (payload(6) & 0xff)
      (w, h, f, payload.drop(7))
    }
  }

  /** Deterministic synthetic media table (mediaId, kind, payload BINARY,
    * width, height, frames) — the binary-column fixture. */
  def synthMedia(spark: SparkSession, n: Long, partitions: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { i =>
      val kind = (i % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      val meta = MediaMeta(i, kind, 32 + (i % 32).toInt, 32 + (i % 16).toInt,
        if (kind == "video") 8 + (i % 8).toInt else 1, 16000)
      MediaRow(i, kind, StubCodec.encode(meta, i), meta.width, meta.height, meta.frames)
    }
  }

  /** Batched decode + feature extraction: 8x8 mean-pooled luma grid as the
    * feature vector (the real version would be a CNN/DSP embedding). Runs
    * per partition with an explicit batch loop — the mapInPandas shape. */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val (w, h, _, pixels) = StubCodec.decode(row.payload)
          val grid = new Array[Float](64)
          val counts = new Array[Int](64)
          var i = 0
          while (i < pixels.length) {
            val x = (i % math.max(w, 1)) * 8 / math.max(w, 1)
            val y = (i / math.max(w, 1)) * 8 / math.max(h, 1)
            val cell = math.min(63, y * 8 + x)
            grid(cell) += (pixels(i) & 0xff)
            counts(cell) += 1
            i += 1
          }
          var c = 0
          var lumaSum = 0.0
          while (c < 64) {
            if (counts(c) > 0) grid(c) /= counts(c)
            lumaSum += grid(c)
            c += 1
          }
          MediaFeature(row.mediaId, row.kind, grid, row.frames, lumaSum / 64.0)
        }
      }
    }
  }

  /** Resize: re-encode to target dims by nearest-neighbor over the stub
    * luma plane (batched, per-partition). */
  def resize(media: Dataset[MediaRow], tw: Int, th: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { row =>
      val (w, h, f, pixels) = StubCodec.decode(row.payload)
      val out = new Array[Byte](tw * th)
      var y = 0
      while (y < th) {
        var x = 0
        while (x < tw) {
          val sx = x * math.max(w, 1) / tw
          val sy = y * math.max(h, 1) / th
          val si = sy * w + sx
          out(y * tw + x) = if (si < pixels.length) pixels(si) else 0
          x += 1
        }
        y += 1
      }
      val head = Array[Byte](row.kind.headOption.getOrElse('i').toByte,
        (tw >> 8).toByte, tw.toByte, (th >> 8).toByte, th.toByte,
        (f >> 8).toByte, f.toByte)
      row.copy(payload = head ++ out, width = tw, height = th)
    }
  }

  /** Frame sampling for video rows: keep every `stride`-th frame index as a
    * (mediaId, frameIdx) table — the shuffle-free explode that a frame-level
    * pipeline fans out from. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    // total function: sequence(0, -1, +stride) throws ("Illegal sequence
    // boundaries") — a frames=0 row (corrupt metadata) must yield no rows,
    // not fail the job; stride must be positive for the same reason
    require(stride >= 1, s"stride must be >= 1, got $stride")
    media.filter(col("kind") === "video" && col("frames") > 0)
      .select(col("mediaId"),
        explode(sequence(lit(0), col("frames") - 1, lit(stride))).as("frameIdx"))
  }
}
