package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.similarity.Similarity

/** q166's quality claim, measured: int8 scalar quantization + exact
  * re-rank must recover nearly all of the brute-force top-5 — the
  * quantized index is 4× smaller, and the approx-candidate → exact
  * re-rank split is what keeps the emitted scores exact regardless.
  */
class QuantizedAnnSpec extends SparkSpec {

  test("int8-quantized ANN keeps recall@5 >= 0.9 vs brute force") {
    val d = sf("sf0.01")
    val got = SparkEntry.queries("q166_quantized_ann")(spark, d)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = Tables.embeddings(spark, d)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val queries = base.filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val brute = Similarity.bruteForceTopK(queries, base, "q_id", "vec_id", "qv", "v", 5)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    val recall = got.intersect(brute).size.toDouble / brute.size
    info(f"recall@5 vs brute force: $recall%.3f (${got.intersect(brute).size}/${brute.size})")
    assert(recall >= 0.9, f"quantization lost too much recall: $recall%.3f")
  }
}
