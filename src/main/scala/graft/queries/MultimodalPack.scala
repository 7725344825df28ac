package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.io.Tables
import graft.multimodal.Multimodal
import graft.text.TextOps

/** Multimodal binary-column pipeline (decode runs via typed
  * `mapPartitions` batches over a BinaryType column — mapInPandas-shaped).
  * The decode itself is the documented deterministic stub, so the oracle
  * can replay it arithmetically; the Spark-side plumbing (binary column,
  * partition batching, typed schema) is fully real.
  */
object MultimodalPack extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q44_media_decode" -> { (s, d) =>
      val media = Multimodal.mediaFromText(Tables.documents(s, d), "doc_id", "text")
      Multimodal.decodeAll(media, Multimodal.StubDecoder)
        .toDF().withColumnRenamed("id", "doc_id")
    },

    // decode → resize pipeline: two composed mapPartitions stages, fit
    // into a 128-box without upscaling; geometry + content key checked.
    "q68_media_resize" -> { (s, d) =>
      val media = Multimodal.mediaFromText(Tables.documents(s, d), "doc_id", "text")
      Multimodal.resizeAll(Multimodal.decodeAll(media, Multimodal.StubDecoder), 128)
        .toDF().withColumnRenamed("id", "doc_id")
    },

    // decode → frame-sample pipeline: 1→N in-partition explode keeping at
    // most 4 frames per "video" (stride = ceil(n_frames/4)).
    "q69_frame_sample" -> { (s, d) =>
      val media = Multimodal.mediaFromText(Tables.documents(s, d), "doc_id", "text")
      Multimodal.sampleFrames(Multimodal.decodeAll(media, Multimodal.StubDecoder), 4)
        .toDF().withColumnRenamed("id", "doc_id")
    }
  )

  /** The q44 decode math as a CTE (shared by the downstream stages). */
  private def decodedCte: String = {
    val h = TextOps.hash32Sql("text")
    s"""dec AS (SELECT doc_id,
          CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          16 + ($h) % 1920 AS width,
          16 + (($h) // 1920) % 1080 AS height,
          1 + ($h) % 16 AS n_frames
        FROM documents)"""
  }

  override def oracles: Map[String, String] = Map(
    "q44_media_decode" ->
      s"""WITH $decodedCte SELECT doc_id, n_bytes, width, height, n_frames FROM dec""",

    "q68_media_resize" ->
      s"""WITH $decodedCte,
          sc AS (SELECT *, LEAST(1.0, LEAST(128.0 / width, 128.0 / height)) AS scale FROM dec),
          rs AS (SELECT doc_id, width, height,
                   GREATEST(1, CAST(FLOOR(width * scale) AS BIGINT)) AS thumb_w,
                   GREATEST(1, CAST(FLOOR(height * scale) AS BIGINT)) AS thumb_h
                 FROM sc)
          SELECT doc_id, width, height, thumb_w, thumb_h,
                 md5(doc_id || ':' || thumb_w || 'x' || thumb_h) AS thumb_key
          FROM rs""",

    "q69_frame_sample" ->
      s"""WITH $decodedCte,
          st AS (SELECT doc_id, n_frames,
                   GREATEST(1, CAST(CEIL(n_frames / 4.0) AS BIGINT)) AS stride
                 FROM dec)
          SELECT doc_id, i AS frame_idx, md5(doc_id || ':' || i) AS frame_key
          FROM st CROSS JOIN range(0, 16) t(i)
          WHERE i < n_frames AND i % stride = 0"""
  )
}
