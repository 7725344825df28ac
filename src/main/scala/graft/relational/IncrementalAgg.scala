package graft.relational

import org.apache.spark.sql.DataFrame

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
  * Scale shape: the shared [[KeyedUpsert]] broadcast decomposition — the
  * view is scanned, never shuffled; the delta aggregate ships twice as a
  * broadcast.
  */
object IncrementalAgg {

  /** Merge `delta` aggregate state into `view` on `keys`. Every non-key
    * column must combine with `+` — ADDITIVE state only (counts,
    * exact-decimal sums; NOT min/max, which need a different combiner) —
    * and be null-free on both sides (COUNT/SUM over non-null inputs are). */
  def merge(view: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame =
    KeyedUpsert(view, delta, keys, (v, d) => v + d)
}
