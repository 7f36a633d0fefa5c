package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads as opaque `binary`
  * columns with typed metadata, processed batch-at-a-time through typed
  * `mapPartitions` (the JVM analogue of arrow-batched pandas UDFs — one
  * decoder instance per partition, rows streamed through it).
  *
  * The actual codec work is STUBBED (this container has no image/audio
  * libraries): `DecoderStub` parses a deterministic fake header instead
  * of real JPEG/WAV bytes. Everything Spark-sees — schema, batching,
  * partitioning, the operator surface — is real and tested; swapping
  * `DecoderStub` for a real codec is a one-class change.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaItem(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte])

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      checksum: Long)

  /** STUB codec: reads the 12-byte fake header `[w:4][h:4][frames:4]`
    * (big-endian) a real decoder would extract from the container
    * format, plus a payload checksum standing in for pixel features. */
  object DecoderStub {
    def decode(item: MediaItem): MediaFeatures = {
      val bb = java.nio.ByteBuffer.wrap(item.payload)
      val (w, h, f) =
        if (item.payload.length >= 12) (bb.getInt(0), bb.getInt(4), bb.getInt(8))
        else (0, 0, 0)
      var sum = 0L
      var i = 0
      while (i < item.payload.length) { sum = sum * 31 + (item.payload(i) & 0xff); i += 1 }
      MediaFeatures(item.media_id, item.kind, item.payload.length.toLong,
        w, h, f, sum)
    }

    /** Build a fake payload for tests/synthetic pipelines. */
    def encode(w: Int, h: Int, frames: Int, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + body.length)
      bb.putInt(w).putInt(h).putInt(frames).put(body)
      bb.array()
    }
  }

  /** Decode/feature-extract: batched per partition, no shuffle; at
    * 100 TB the payload column never leaves the executor that read it
    * (narrow map over the scan). */
  def extractFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions { it => it.map(DecoderStub.decode) }
  }

  /** Resize stub: keeps the plumbing (binary in → binary out, metadata
    * update) while the pixel work is fake (header rewrite). */
  def resize(items: Dataset[MediaItem], w: Int, h: Int): Dataset[MediaItem] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        val feats = DecoderStub.decode(m)
        m.copy(payload =
          DecoderStub.encode(w, h, feats.n_frames,
            m.payload.drop(math.min(12, m.payload.length))))
      }
    }
  }

  /** Frame sampling stub for video payloads: emits one row per sampled
    * frame index (the explode shape a real sampler has). */
  def sampleFrames(items: Dataset[MediaItem], everyN: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items.flatMap { m =>
      val f = DecoderStub.decode(m)
      (0 until f.n_frames by math.max(everyN, 1))
        .map(i => (m.media_id, i, f.width, f.height))
    }.toDF("media_id", "frame_idx", "width", "height")
  }
}
