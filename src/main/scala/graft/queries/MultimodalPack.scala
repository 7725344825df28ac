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
    }
  )

  override def oracles: Map[String, String] = Map(
    "q44_media_decode" -> {
      val h = TextOps.hash32Sql("text")
      s"""SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           16 + ($h) % 1920 AS width,
           16 + (($h) // 1920) % 1080 AS height,
           1 + ($h) % 16 AS n_frames
         FROM documents"""
    }
  )
}
