package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval–interval overlap join without the cartesian product.
  *
  * The naive formulation — `A CROSS JOIN B WHERE a.start <= b.end AND
  * b.start <= a.end` — has no equi-key, so Spark plans it as a broadcast
  * nested-loop / cartesian: O(|A|·|B|) comparisons, unusable when both
  * sides are large. The scalable shape BANDS time into fixed bins: each
  * interval is exploded onto the bins it touches, the join becomes an
  * equi-join on the bin (hash-partitionable, AQE-skewable), the exact
  * overlap predicate filters within the bin, and a distinct collapses the
  * duplicates from intervals sharing several bins.
  *
  * Cost: |A|·avg_bins_A + |B|·avg_bins_B shuffled rows — pick the bin
  * width near the typical interval length so avg_bins stays O(1). Skewed
  * hot bins (an incident window everyone overlaps) split under AQE skew
  * handling like any hash join.
  */
object Intervals {

  /** Closed-interval overlap join on hour bins. Column names must be
    * disjoint across `left` and `right` (checked — a clash would silently
    * misbind the overlap predicate); both interval columns must be
    * timestamps with start <= end. Returns the overlapping (left row,
    * right row) pairs — exactly what the naive cartesian formulation
    * yields, so two genuinely identical input rows each produce their own
    * output pair.
    *
    * Multi-bin duplicates never exist to be deduped: a pair overlapping
    * several shared bins is kept only in its CANONICAL bin — `max` of the
    * two start-hours, which both intervals provably touch whenever they
    * overlap (rStart ≤ lEnd ⇒ hour(rStart) ≤ hour(lEnd), symmetrically)
    * and which is unique per pair. A map-side predicate instead of the
    * former full-row `distinct()`, which cost an extra shuffle AND
    * collapsed genuinely duplicate input rows. */
  def overlapJoin(left: DataFrame, lStart: String, lEnd: String,
                  right: DataFrame, rStart: String, rEnd: String): DataFrame = {
    val clash = left.columns.toSet.intersect(right.columns.toSet)
    require(clash.isEmpty,
      s"overlapJoin requires disjoint column names; shared: ${clash.mkString(", ")}")
    val lb = left.withColumn("__graft_bin",
      explode(sequence(date_trunc("hour", col(lStart)), date_trunc("hour", col(lEnd)),
        expr("interval 1 hour"))))
    val rb = right.withColumn("__graft_bin",
      explode(sequence(date_trunc("hour", col(rStart)), date_trunc("hour", col(rEnd)),
        expr("interval 1 hour"))))
    lb.join(rb, "__graft_bin")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__graft_bin") ===
        greatest(date_trunc("hour", col(lStart)), date_trunc("hour", col(rStart))))
      .drop("__graft_bin")
  }
}
