package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.relational.Joins

/** Ranking metrics beyond the accuracy/R² pair in [[Models]] (M12/M13).
  *
  * ROC-AUC via the Mann-Whitney rank statistic:
  * AUC = (Σ_{positives} avgrank − nPos·(nPos+1)/2) / (nPos·nNeg), with
  * tied scores receiving their average rank (the sklearn/scipy tie
  * convention).
  *
  * Distributed shape: the global ordering is a range-partitioned sort +
  * `zipWithIndex` ([[Joins.zipWithRowId]] — a narrow single-pass index,
  * NOT a one-partition window), then one hash aggregation per distinct
  * score and a scalar fold. Ranks within a tied score block are
  * consumed only as (min, count) of the block, so the arbitrary order
  * inside a tie never reaches the result. Every summed term is an
  * integer or half-integer < 2⁵³ routed through exact DECIMAL, so the
  * statistic is bit-reproducible against a window-function SQL replay.
  */
object Metrics {

  /** @param scored frame with a double `scoreCol` and an integer/boolean
    *               `labelCol` (1 = positive)
    * @return one row: (auc, n_pos, n_neg)
    */
  def rocAuc(scored: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val ranked = Joins.zipWithRowId(
      scored.select(col(scoreCol).as("s"),
        col(labelCol).cast("long").as("y")),
      Seq(col("s")), idCol = "idx")
    // per distinct score: block start index a, block size c, positives p;
    // every positive in the block has avgrank = a + 1 + (c-1)/2 (exact
    // half-integers, so the decimal sum is exact and order-free)
    ranked.groupBy("s")
      .agg(min("idx").as("a"), count(lit(1)).as("c"), sum("y").as("p"))
      .agg(
        sum((col("p") * (col("a").cast("double") + lit(1.0)
            + (col("c").cast("double") - lit(1.0)) / lit(2.0)))
          .cast(DecimalType(38, 6))).cast("double").as("posrank"),
        sum("p").as("np"),
        (sum("c") - sum("p")).as("nn"))
      .select(
        // AUC is undefined on a single-class input (nPos·nNeg = 0): emit an
        // EXPLICIT null rather than the NaN/Infinity the raw division would
        // produce — callers see "no ranking statistic exists", not a
        // poisoned double that propagates through downstream aggregates.
        when(col("np") === 0 || col("nn") === 0, lit(null).cast("double"))
          .otherwise(
            (col("posrank") - col("np").cast("double") * (col("np").cast("double") + lit(1.0)) / lit(2.0))
              / (col("np").cast("double") * col("nn").cast("double"))).as("auc"),
        col("np").as("n_pos"), col("nn").as("n_neg"))
  }
}
