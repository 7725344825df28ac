package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance: fold a small delta batch of
  * additive aggregate state into a large persisted view WITHOUT rescanning
  * the base facts — the warehouse pattern that turns an O(100 TB) nightly
  * re-aggregation into an O(|delta|) merge.
  *
  * Reference behavior: the reference engine re-runs its grouped aggregates
  * from scratch per query (see /root/reference gexp pipelines); at 100 TB
  * that rescan is the dominant cost, so the Spark-first design maintains
  * the aggregate as state and merges deltas.
  *
  * Scale shape (same broadcast decomposition as [[Scd.cdcApply]], and for
  * the same reason — Spark silently drops broadcast hints on FULL OUTER
  * joins, which would shuffle the whole view):
  *  - updated keys: broadcast LEFT OUTER join of the view with the delta
  *    aggregate, additive columns combined with `+` (state must be
  *    order-independent: counts, exact-decimal sums, min/max);
  *  - new keys: broadcast LEFT SEMI probe of view keys (key-column-pruned
  *    second scan — cheaper than shuffling the view) then a small-vs-small
  *    anti join.
  * The view is scanned, never shuffled; the delta aggregate ships twice as
  * a broadcast. Additive columns must be null-free on both sides (group
  * aggregates of COUNT/SUM over non-null inputs are).
  */
object IncrementalAgg {

  /** Merge `delta` aggregate state into `view` on `keys`; every non-key
    * column of `view` must exist in `delta` and combine additively. */
  def merge(view: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    val addCols = view.columns.toSeq.filterNot(keys.contains)
    val d = delta.columns.foldLeft(delta)((f, c) => f.withColumnRenamed(c, s"_d_$c"))
    val joinCond = keys.map(k => view(k) === d(s"_d_$k")).reduce(_ && _)
    val updated = view.join(broadcast(d), joinCond, "left_outer")
      .select(keys.map(k => view(k).as(k)) ++
        addCols.map(c => (view(c) + coalesce(d(s"_d_$c"), lit(0))).as(c)): _*)
    val matched = view.join(broadcast(d), joinCond, "left_semi")
      .select(keys.map(col): _*)
    val mcond = keys.map(k => d(s"_d_$k") === matched(k)).reduce(_ && _)
    val fresh = d.join(broadcast(matched), mcond, "left_anti")
      .select((keys ++ addCols).map(c => col(s"_d_$c").as(c)): _*)
    updated.unionByName(fresh)
  }
}
