package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.similarity.Similarity

/** q165's maintenance contract, asserted directly: indexing only the
  * delta against the frozen centroids and unioning with the base segment
  * must be BIT-IDENTICAL to a full rebuild — cell assignment is a per-row
  * argmax under fixed centroids, so segmenting can never change it.
  */
class IncrementalIndexSpec extends SparkSpec {

  test("delta-segment indexing is bit-identical to a full index rebuild") {
    val d = sf("sf0.001")
    val base = Tables.embeddings(spark, d)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val cents = base.filter(pmod(col("vec_id"), lit(500)) === 0)
      .select(col("vec_id").as("__cell"), col("v").as("__cv"))
    val hist = base.filter(pmod(col("vec_id"), lit(7)) =!= 3)
    val delta = base.filter(pmod(col("vec_id"), lit(7)) === 3)
    val incremental = Similarity.indexCells(hist, cents, "v")
      .unionByName(Similarity.indexCells(delta, cents, "v"))
    val full = Similarity.indexCells(base, cents, "v")
    assert(incremental.count() == full.count() && full.count() > 0)
    assert(incremental.exceptAll(full).count() == 0 &&
      full.exceptAll(incremental).count() == 0,
      "segmented index diverged from the full rebuild")
  }
}
