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
}
