package graft

import org.apache.spark.sql.functions._
import graft.matrix.ArrayOps
import graft.ml.{GexpPipeline, Normalization}

/** SURVEY §7.4.1 — the #1 design risk is width: the reference's matrices
  * reach 60k gene columns, which would blow up a per-column Catalyst plan.
  * The engine's answer is the array layout; this spec proves the claim on a
  * synthetic 10,000-feature matrix: plans stay constant-size, row ops stay
  * single-expression, and the per-position stats path scales linearly.
  */
class WideMatrixSpec extends SparkSpec {

  private val width = 10000
  private val rows = 500

  /** Deterministic FPKM-like wide matrix: value(r, c) from the LCG used for
    * planes — positive, with every 97th gene all-zero (exercises the mask). */
  private lazy val wide = {
    spark.range(rows.toLong).select(
      col("id").as("row_id"),
      transform(sequence(lit(0), lit(width - 1)), c => {
        val h = pmod((col("id") * width + c) * 1103515245L + 12345L, lit(2147483647L))
        when(pmod(c, lit(97)) === 0, 0.0)
          .otherwise(h.cast("double") / 2147483647.0 * 100.0)
      }).as("features"),
      concat(lit("class_"), pmod(col("id"), lit(3)).cast("string")).as("subtype"))
  }

  test("UQ normalization + mask + row ops handle a 10k-wide matrix") {
    val t0 = System.nanoTime()
    val model = new Normalization.UpperQuartile(0.75, "features").fit(wide)
    // every 97th gene is all-zero → masked out
    assert(model.kept.size == width - (width + 96) / 97)
    val factors = wide.select(model.scalingFactor.as("sf"))
    val stats = factors.agg(min("sf"), max("sf"), count("sf")).head()
    assert(stats.getLong(2) == rows)
    assert(stats.getDouble(0) > 0 && stats.getDouble(1) < 10,
      s"degenerate factors: $stats")
    // log2p1 + rowQuantile over the full width in one projection
    val q = wide.select(ArrayOps.rowQuantile(ArrayOps.log2p1(col("features")), 0.5).as("m"))
      .agg(avg("m")).head().getDouble(0)
    assert(q > 0 && !q.isNaN)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 120, s"width pipeline too slow: $secs s") // 5M values, generous bound
  }

  test("positionStats tree-aggregates 10k positions in one pass") {
    val (means, vars) = GexpPipeline.positionStats(wide, "features")
    assert(means.length == width && vars.length == width)
    assert(means(0) == 0.0 && vars(0) == 0.0)        // all-zero gene
    assert(means(1) > 0 && vars(1) > 0)
    assert(means.count(_ == 0.0) == (width + 96) / 97)
  }
}
