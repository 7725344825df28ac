package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in per-partition
  * batches.
  *
  * Architecture (the part that is real and tested):
  *  - media travels as a `BinaryType` column next to its id/metadata;
  *  - decode runs via `Dataset.mapPartitions` — the JVM analog of
  *    `mapInPandas`: one decoder instance per partition, streaming over an
  *    iterator, so codec init cost amortizes and memory stays bounded;
  *  - output is a typed case class ⇒ stable schema for downstream SQL.
  *
  * ==== STUB ====
  * The actual image/audio codecs are NOT in this container, so
  * [[StubDecoder]] is a clearly-marked deterministic fake: it derives
  * "decoded" dimensions from an md5 of the bytes. Swap in a real codec by
  * implementing [[MediaDecoder]] — nothing else changes.
  */
object Multimodal {

  case class MediaItem(id: Long, media: Array[Byte])
  case class DecodedMeta(id: Long, n_bytes: Long, width: Long, height: Long, n_frames: Long)

  /** Decoder contract: one instance per partition, called per item. */
  trait MediaDecoder extends Serializable {
    def decode(item: MediaItem): DecodedMeta
  }

  /** Deterministic fake decode: md5-derived dimensions. Replace with a real
    * codec (javax.imageio / ffmpeg bindings) outside this container. */
  object StubDecoder extends MediaDecoder {
    def hash32(bytes: Array[Byte]): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(bytes).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    override def decode(item: MediaItem): DecodedMeta = {
      val h = hash32(item.media)
      DecodedMeta(
        id = item.id,
        n_bytes = item.media.length.toLong,
        width = 16L + h % 1920L,
        height = 16L + (h / 1920L) % 1080L,
        n_frames = 1L + h % 16L)
    }
  }

  /** Batch decode over partitions (mapInPandas-shaped: iterator in,
    * iterator out, one decoder per partition). */
  def decodeAll(media: Dataset[MediaItem], decoder: MediaDecoder): Dataset[DecodedMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it => it.map(decoder.decode) }
  }

  /** Attach a binary media column derived from text (the corpus has no real
    * blobs; UTF-8 bytes stand in so the binary plumbing is exercised
    * end-to-end). */
  def mediaFromText(df: DataFrame, idCol: String, textCol: String): Dataset[MediaItem] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id"), col(textCol).cast("binary").as("media"))
      .as[MediaItem]
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  case class ResizedMeta(id: Long, width: Long, height: Long,
                         thumb_w: Long, thumb_h: Long, thumb_key: String)

  /** Resizer contract — same shape as [[MediaDecoder]]: one instance per
    * partition. The STUB computes the real fit-within-box geometry (never
    * upscaling) and stands in for the pixel work with a deterministic
    * content key; a real resizer returns actual thumbnail bytes. */
  trait MediaResizer extends Serializable {
    def resize(m: DecodedMeta, box: Int): ResizedMeta
  }

  object StubResizer extends MediaResizer {
    override def resize(m: DecodedMeta, box: Int): ResizedMeta = {
      val scale = math.min(1.0, math.min(box.toDouble / m.width, box.toDouble / m.height))
      val tw = math.max(1L, math.floor(m.width * scale).toLong)
      val th = math.max(1L, math.floor(m.height * scale).toLong)
      ResizedMeta(m.id, m.width, m.height, tw, th, md5hex(s"${m.id}:${tw}x$th"))
    }
  }

  /** Partition-batched resize stage (decode → resize pipelines compose as
    * successive `mapPartitions` passes — no shuffle between stages). */
  def resizeAll(decoded: Dataset[DecodedMeta], box: Int,
                resizer: MediaResizer = StubResizer): Dataset[ResizedMeta] = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions(it => it.map(resizer.resize(_, box)))
  }

  case class FrameSample(id: Long, frame_idx: Long, frame_key: String)

  /** Frame sampling: one output row per kept frame — the 1→N iterator
    * `flatMap` batch shape (in-partition explode). Keeps every `stride`-th
    * frame with stride = ⌈n_frames / maxFrames⌉, so at most `maxFrames`
    * frames survive per video. The frame "content" is the deterministic
    * stub key; a real implementation emits decoded frame bytes. */
  def sampleFrames(decoded: Dataset[DecodedMeta], maxFrames: Int): Dataset[FrameSample] = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions(it => it.flatMap { m =>
      val stride = math.max(1L, math.ceil(m.n_frames.toDouble / maxFrames).toLong)
      (0L until m.n_frames by stride).iterator
        .map(i => FrameSample(m.id, i, md5hex(s"${m.id}:$i")))
    })
  }
}
