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
    Multimodal.prepareVideoFiles(spark, sfDir)
    Multimodal.prepareAudioFiles(spark, sfDir)
    Multimodal.prepareImageDirectory(spark, sfDir)
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

    // ── q191: binaryFile DIRECTORY ingest — the raw multimodal-lake
    // source. A directory of real .png files (the layout images actually
    // arrive in, one object per image) is read with Spark's binaryFile
    // source: pathGlobFilter excludes the planted non-png decoy, the id
    // parses from the file NAME, the bytes ImageIO-decode for real, and
    // the oracle replays count + geometry sums + the constant-red mean
    // from the staging arithmetic alone. The parquet-packed corpus
    // (q44) is what this layout graduates to after one compaction pass —
    // at 100 TB the lake holds both, and the engine now reads both.
    "q191_binaryfile_ingest" -> { (s, d) =>
      import s.implicits._
      val dir = Multimodal.prepareImageDirectory(s, d)
      val bin = s.read.format("binaryFile")
        .option("pathGlobFilter", "*.png").load(dir)
        .select(
          regexp_extract(col("path"), "img_(\\d+)\\.png$", 1).cast("long").as("id"),
          col("content").as("media"))
        .as[Multimodal.MediaItem]
      Multimodal.decodeAll(bin, Multimodal.ImageIODecoder).toDF()
        .agg(count(lit(1)).as("n"), sum(col("width")).as("sum_w"),
          sum(col("height")).as("sum_h"),
          graft.util.Parity.dsum(col("mean_r")).as("sum_r"))
    },

    // decode → frame-sample pipeline (VIDEO shape, documented stub
    // decoder): 1→N in-partition explode keeping at most 4 frames per
    // "video" (stride = ceil(n_frames/4)).
    "q69_frame_sample" -> { (s, d) =>
      val media = Multimodal.mediaFromText(Tables.documents(s, d), "doc_id", "text")
      Multimodal.sampleFrames(Multimodal.decodeAll(media, Multimodal.StubDecoder), 4)
        .toDF().withColumnRenamed("id", "doc_id")
    },

    // REAL video frame sampling: parse the staged GVID container (magic +
    // frame count + length-prefixed PNG frames), seek via the length
    // fields, and ImageIO-decode ONLY the sampled frames — skipped frames
    // cost a length-field read, not a decode. Geometry and per-frame
    // mean(R) are replayed by the oracle from the staging formulas; a
    // sampler that decoded the wrong frames (or faked the pixels)
    // hash-mismatches on mean_r.
    "q102_video_frames" -> { (s, d) =>
      Multimodal.sampleVideoFrames(Multimodal.videoTable(s, d), 4)
        .toDF().withColumnRenamed("id", "doc_id")
    },

    // REAL audio decode: javax.sound.sampled parses the staged WAV
    // container (format fields from the header) and every 16-bit PCM
    // sample is read and averaged — the oracle replays the sample math
    // arithmetically, so header-only parsing (or wrong endianness/sign)
    // hash-mismatches on mean_amp.
    "q103_audio_decode" -> { (s, d) =>
      Multimodal.decodeAudio(Multimodal.audioTable(s, d))
        .toDF().withColumnRenamed("id", "doc_id")
    },

    // windowed audio feature extraction: RMS energy per 100-sample PCM
    // window (1→N in-partition, decode + math in one pass). The integer
    // square-sum is exact, so the oracle replays sqrt(mean(samp²))
    // bit-for-bit from the staging formula.
    "q104_audio_energy" -> { (s, d) =>
      Multimodal.audioEnergy(Multimodal.audioTable(s, d), 100)
        .toDF().withColumnRenamed("id", "doc_id")
    },

    // image near-dup via perceptual average-hash: REAL decode → 8×8
    // nearest-neighbor grid → 64-bit aHash ([[Multimodal.aHash]]), then
    // near-dup clustering is an exact hash-groupBy — q29's shuffle shape
    // over images, never a pairwise pixel comparison. The oracle replays
    // the sampled grid positions arithmetically from the staging formulas.
    "q132_image_ahash" -> { (s, d) =>
      Multimodal.aHash(Multimodal.imageTable(s, d)).toDF()
        .groupBy("ahash")
        .agg(count(lit(1)).as("n_images"), min(col("id")).as("min_doc_id"))
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
    // aHash replay: the staged PNG's pixel (x,y) is (r, x%256, y%256) with
    // r = doc_id%256, so the sampled ×3-gray is pure integer arithmetic
    // over the geometry formulas; bit k set iff g3[k]·64 > Σg3. The bit
    // sum equals Java's signed long (bit 63 contributes −2^63 in HUGEINT,
    // exact under the final BIGINT cast).
    "q132_image_ahash" ->
      s"""WITH $geomCte,
          g AS (SELECT doc_id, list_transform(range(64), k ->
                  (doc_id % 256) + ((((k % 8) * width) // 8) % 256)
                                 + ((((k // 8) * height) // 8) % 256)) AS g3
                FROM geom),
          sc AS (SELECT doc_id, g3, list_sum(g3) AS s FROM g),
          ah AS (SELECT doc_id, CAST(list_sum(list_transform(range(64), k ->
                   CASE WHEN g3[k + 1] * 64 <= s THEN CAST(0 AS BIGINT)
                        WHEN k = 63 THEN CAST(-9223372036854775807 - 1 AS BIGINT)
                        ELSE (CAST(1 AS BIGINT) << k) END))
                 AS BIGINT) AS ahash
                 FROM sc)
          SELECT ahash, COUNT(*) AS n_images, MIN(doc_id) AS min_doc_id
          FROM ah GROUP BY ahash""",

    "q44_media_decode" ->
      s"""WITH $geomCte,
          med AS (SELECT doc_id, CAST(octet_length(media) AS BIGINT) AS n_bytes
                  FROM ${graft.util.OracleDump.sqlGlob("q44_media")})
          SELECT g.doc_id, med.n_bytes, g.width, g.height,
                 CAST(1 AS BIGINT) AS n_frames,
                 CAST(g.doc_id % 256 AS DOUBLE) AS mean_r
          FROM geom g JOIN med USING (doc_id)""",

    // q191: decode results replayed purely from the staging arithmetic
    // over the sampled ids — no blob access needed
    "q191_binaryfile_ingest" ->
      s"""SELECT COUNT(*) AS n,
                 CAST(SUM(16 + (doc_id * 37) % 120) AS BIGINT) AS sum_w,
                 CAST(SUM(16 + (doc_id * 53) % 88) AS BIGINT) AS sum_h,
                 CAST(SUM(doc_id % 256) AS DOUBLE) AS sum_r
          FROM documents WHERE doc_id % 29 = 0""",

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
          WHERE i < n_frames AND i % stride = 0""",

    // GVID staging replay: nf = 2 + id%7, geometry (16 + id%13) ×
    // (16 + id%11), sampled frames are multiples of stride = ceil(nf/4),
    // constant red channel (7·id + 31·frame) mod 256.
    "q102_video_frames" ->
      """WITH v AS (SELECT doc_id, 2 + doc_id % 7 AS nf FROM documents),
          st AS (SELECT doc_id, nf, CAST(CEIL(nf / 4.0) AS BIGINT) AS stride FROM v),
          fr AS (SELECT doc_id, nf, i AS frame_idx
                 FROM st CROSS JOIN range(0, 9) t(i)
                 WHERE i < nf AND i % stride = 0)
          SELECT doc_id, CAST(nf AS BIGINT) AS n_frames,
                 CAST(frame_idx AS BIGINT) AS frame_idx,
                 CAST(16 + doc_id % 13 AS BIGINT) AS width,
                 CAST(16 + doc_id % 11 AS BIGINT) AS height,
                 CAST((doc_id * 7 + 31 * frame_idx) % 256 AS DOUBLE) AS mean_r
          FROM fr""",

    // WAV staging replay: n = 500 + id%257 samples of
    // ((31·id + 7·i) mod 2003) − 1001; integer sum is exact in both
    // engines, division orders mirrored.
    "q103_audio_decode" ->
      """WITH v AS (SELECT doc_id, 500 + doc_id % 257 AS n FROM documents),
          s AS (SELECT doc_id, n, ((doc_id * 31 + 7 * i) % 2003) - 1001 AS samp
                FROM v CROSS JOIN range(0, 757) t(i) WHERE i < n)
          SELECT doc_id, CAST(8000 AS BIGINT) AS sample_rate,
                 CAST(1 AS BIGINT) AS channels, CAST(16 AS BIGINT) AS bits,
                 CAST(n AS BIGINT) AS n_samples,
                 CAST(SUM(samp) AS DOUBLE) / n AS mean_amp
          FROM s GROUP BY doc_id, n""",

    "q104_audio_energy" ->
      """WITH v AS (SELECT doc_id, 500 + doc_id % 257 AS n FROM documents),
          s AS (SELECT doc_id, i // 100 AS win_idx,
                  ((doc_id * 31 + 7 * i) % 2003) - 1001 AS samp
                FROM v CROSS JOIN range(0, 757) t(i) WHERE i < n)
          SELECT doc_id, CAST(win_idx AS BIGINT) AS win_idx,
                 CAST(COUNT(*) AS BIGINT) AS n_in_win,
                 sqrt(CAST(SUM(samp * samp) AS DOUBLE) / COUNT(*)) AS rms
          FROM s GROUP BY doc_id, win_idx"""
  )
}
