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
    * disjoint across `left` and `right`; both interval columns must be
    * timestamps with start <= end. Returns the distinct overlapping
    * combinations of (left columns ++ right columns). */
  def overlapJoin(left: DataFrame, lStart: String, lEnd: String,
                  right: DataFrame, rStart: String, rEnd: String): DataFrame = {
    val lb = left.withColumn("__graft_bin",
      explode(sequence(date_trunc("hour", col(lStart)), date_trunc("hour", col(lEnd)),
        expr("interval 1 hour"))))
    val rb = right.withColumn("__graft_bin",
      explode(sequence(date_trunc("hour", col(rStart)), date_trunc("hour", col(rEnd)),
        expr("interval 1 hour"))))
    lb.join(rb, "__graft_bin")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .drop("__graft_bin")
      .distinct()
  }
}
