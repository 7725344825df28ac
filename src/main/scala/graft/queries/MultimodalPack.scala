package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.io.Tables
import graft.multimodal.Multimodal
import graft.text.TextOps

/** Multimodal binary-column pipeline (decode runs via typed
  * `mapPartitions` batches over a BinaryType column — mapInPandas-shaped).
  *
  * The IMAGE queries (q44 decode, q68 resize) run the REAL JDK codec
  * (`javax.imageio` + Java2D) over a deterministically staged PNG corpus:
  * true dimensions and frame counts come from the decoded container, and
  * the red channel of every staged PNG is constant at `doc_id mod 256` —
  * the content statistic whose mean survives decode AND resample exactly,
  * so plain SQL can verify real pixel work without parsing PNG. The
  * VIDEO-shaped query (q69 frame sampling) keeps the documented stub
  * decoder: no video codec ships in this container, and the 1→N frame
  * explode is the part under test.
  */
object MultimodalPack extends QueryPack {

  override def stage(spark: SparkSession, sfDir: String): Unit = {
    Multimodal.prepareImageFiles(spark, sfDir)
    ()
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // REAL image decode: ImageIO parses each staged PNG; width/height/
    // frame-count/mean(R) all come from the decoded bytes. The staged
    // media table is side-dumped so the oracle can derive n_bytes with
    // octet_length over the very same blobs; geometry and mean(R) are
    // independently replayed from the doc_id staging formulas — a decoder
    // that fabricated dimensions or skipped pixels hash-mismatches.
    "q44_media_decode" -> { (s, d) =>
      val media = Multimodal.imageTable(s, d)
      graft.util.OracleDump.dump(media.toDF("doc_id", "media"), "q44_media")
      Multimodal.decodeAll(media, Multimodal.ImageIODecoder)
        .toDF().withColumnRenamed("id", "doc_id")
    },

    // REAL decode → resize pipeline: Java2D nearest-neighbor resample into
    // a fit-within-128 box (never upscaling), red-channel mean recomputed
    // over the RESAMPLED raster. Geometry + channel mean SQL-replayed.
    "q68_media_resize" -> { (s, d) =>
      Multimodal.resizeImages(Multimodal.imageTable(s, d), 128)
        .toDF().withColumnRenamed("id", "doc_id")
    },

    // decode → frame-sample pipeline (VIDEO shape, documented stub
    // decoder): 1→N in-partition explode keeping at most 4 frames per
    // "video" (stride = ceil(n_frames/4)).
    "q69_frame_sample" -> { (s, d) =>
      val media = Multimodal.mediaFromText(Tables.documents(s, d), "doc_id", "text")
      Multimodal.sampleFrames(Multimodal.decodeAll(media, Multimodal.StubDecoder), 4)
        .toDF().withColumnRenamed("id", "doc_id")
    }
  )

  /** The stub decode math as a CTE (q69's video-shaped input). */
  private def decodedCte: String = {
    val h = TextOps.hash32Sql("text")
    s"""dec AS (SELECT doc_id,
          1 + ($h) % 16 AS n_frames
        FROM documents)"""
  }

  /** Staged-PNG geometry replay (see [[Multimodal.syntheticPng]]). */
  private val geomCte =
    """geom AS (SELECT doc_id,
         CAST(16 + (doc_id * 37) % 120 AS BIGINT) AS width,
         CAST(16 + (doc_id * 53) % 88 AS BIGINT) AS height
       FROM documents)"""

  override def oracles: Map[String, String] = Map(
    "q44_media_decode" ->
      s"""WITH $geomCte,
          med AS (SELECT doc_id, CAST(octet_length(media) AS BIGINT) AS n_bytes
                  FROM ${graft.util.OracleDump.sqlGlob("q44_media")})
          SELECT g.doc_id, med.n_bytes, g.width, g.height,
                 CAST(1 AS BIGINT) AS n_frames,
                 CAST(g.doc_id % 256 AS DOUBLE) AS mean_r
          FROM geom g JOIN med USING (doc_id)""",

    "q68_media_resize" ->
      s"""WITH $geomCte,
          sc AS (SELECT *, LEAST(1.0, LEAST(128.0 / width, 128.0 / height)) AS scale FROM geom)
          SELECT doc_id, width, height,
                 GREATEST(1, CAST(FLOOR(width * scale) AS BIGINT)) AS thumb_w,
                 GREATEST(1, CAST(FLOOR(height * scale) AS BIGINT)) AS thumb_h,
                 CAST(doc_id % 256 AS DOUBLE) AS thumb_mean_r
          FROM sc""",

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
