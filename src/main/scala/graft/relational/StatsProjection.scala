package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.Parity

/** The reference's central idiom: **stats-driven column selection** —
  * the surviving column set is computed at runtime from data statistics
  * (SURVEY §2.2 P2/P3, §1.3).
  *
  * Reference sites: keep cols with mean > 0
  * (`functions/feature_selection_and_normalization.py:21,47`); keep cols with
  * mean and variance above their own 25th percentiles
  * (`functions/dask_pipeline.py:36-41`, `functions/nondask_pipeline.py:25-29`).
  *
  * Spark shape: this is inherently a **two-job pattern** (no Catalyst rule can
  * fold a data-dependent schema): job 1 computes one aggregate row of
  * per-column stats (single pass, map-side partial aggregation, no shuffle of
  * data rows — only a 1-row exchange); the driver derives the mask from that
  * tiny row; job 2 is an ordinary `select` of survivors, which Parquet
  * column-prunes on re-scan. Cost at 100 TB: one full scan + one scan of the
  * surviving columns — the same lower bound the reference pays.
  *
  * Per SURVEY §7.2.3 the mask is always **global**, never per-partition (the
  * `cluster_default_benchmark.py:63` per-partition variant is treated as a
  * reference bug).
  */
object StatsProjection {

  /** Per-column (n, mean, variance) in long format, computed in ONE
    * aggregation pass over the data (all columns' moments in a single
    * hash-agg row, then unpivoted — distributed throughout, no collect).
    * Deterministic cross-engine via decimal moments ([[Parity]]).
    */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        Parity.davg(col(c)).as(s"${c}__mean"),
        Parity.dvar(col(c)).as(s"${c}__var")
      )
    }
    // project to the stat columns, then fan a single-split local scan out
    // so the decimal-moment partials run on every core (no-op at scale;
    // decimal moments are combine-order independent)
    val src = Scale.fanOut(df.select(cols.map(col): _*))
    val one = src.agg(aggs.head, aggs.tail: _*)
    // unpivot the single stats row to (col_name, n, mean, variance)
    val stacked = cols
      .map(c => s"'$c', ${c}__n, ${c}__mean, ${c}__var")
      .mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stacked) as (col_name, n, mean, variance)")
  }

  /** Collected stats for mask building: col → (mean, variance). */
  def collectStats(df: DataFrame, cols: Seq[String]): Map[String, (Double, Double)] =
    columnStats(df, cols).collect().map { r =>
      r.getString(0) -> (r.getDouble(2), r.getDouble(3))
    }.toMap

  /** P2 — keep columns whose global mean exceeds `minMean`
    * (`feature_selection_and_normalization.py:47`: mean > 0). */
  def projectByMean(df: DataFrame, cols: Seq[String], minMean: Double = 0.0): DataFrame = {
    val stats = collectStats(df, cols)
    val kept  = cols.filter(c => stats(c)._1 > minMean)
    df.select(kept.map(col): _*)
  }

  /** P3 — keep columns with mean AND variance above the q-th quantile of
    * their own distributions (`functions/dask_pipeline.py:36-41`, q=0.25).
    * Quantile is exact linear interpolation (numpy type-7), computed on the
    * driver — the stats vector has one entry per column, always tiny.
    */
  def projectByQuantileThreshold(df: DataFrame, cols: Seq[String], q: Double = 0.25): DataFrame = {
    val stats = collectStats(df, cols)
    val tm    = quantileType7(cols.map(c => stats(c)._1), q)
    val tv    = quantileType7(cols.map(c => stats(c)._2), q)
    val kept  = cols.filter(c => stats(c)._1 > tm && stats(c)._2 > tv)
    df.select(kept.map(col): _*)
  }

  /** Exact linear-interpolation quantile (numpy default / SQL
    * percentile_cont semantics) over a small in-memory vector. */
  def quantileType7(xs: Seq[Double], q: Double): Double = {
    val s = xs.sorted
    val pos = (s.size - 1) * q
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    s(lo) + (s(hi) - s(lo)) * (pos - lo)
  }
}
