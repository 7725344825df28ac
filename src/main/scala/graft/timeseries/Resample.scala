package graft.timeseries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: densify an irregular event stream onto a
  * fixed-interval grid per key, forward-filling the last observed value
  * across gaps — the resample/ffill step every metrics or training-label
  * pipeline needs before windowed feature extraction.
  *
  * Scale shape: the per-bucket rollup is one keyed shuffle with map-side
  * combine; the grid is generated row-locally per key (`sequence` +
  * `explode`, no driver loop, no cross join against a range table); the
  * fill is one window pass per key ordered by bucket. Nothing global, no
  * collect — the plan survives keys × buckets growing 100×.
  */
object Resample {

  /** Hourly grid + forward fill.
    *
    * @param events  frame with `keyCol`, a timestamp `tsCol`, a tiebreak
    *                `seqCol` (unique-ish within key), and a value `valCol`
    * @param gridStart inclusive first bucket (timestamp Column)
    * @param gridEnd   inclusive last bucket
    * @return (key, bucket, n_events, value_ffill): one row per key per
    *         hour; `n_events` is 0 on gap rows; `value_ffill` is the most
    *         recent bucket's last observed value (null only if the key has
    *         NO observation at or before the bucket — observations BEFORE
    *         gridStart carry in across the window edge; per-bucket "last"
    *         = max (ts, seq) row, skipping nothing — a null observed value
    *         is carried over the gap by the IGNORE NULLS fill exactly as
    *         SQL window semantics say).
    */
  def hourlyFfill(events: DataFrame, keyCol: String, tsCol: String,
                  seqCol: String, valCol: String,
                  gridStart: Column, gridEnd: Column): DataFrame = {
    // per-bucket rollup: count + deterministic last value (row_number over
    // (ts, seq) desc — total under a unique (ts, seq), and value-identical
    // under full-row duplicates)
    val perRow = events.select(
      col(keyCol).as("key"), date_trunc("hour", col(tsCol)).as("bucket"),
      col(tsCol).as("ts"), col(seqCol).as("seq"), col(valCol).as("v"))
    val wLast = Window.partitionBy("key", "bucket")
      .orderBy(col("ts").desc, col("seq").desc)
    val buckets = perRow
      .withColumn("rn", row_number().over(wLast))
      .groupBy("key", "bucket")
      .agg(count(lit(1)).as("n_events"),
           max(when(col("rn") === 1, col("v"))).as("last_v"))

    // dense grid: every key × every hour in [gridStart, gridEnd]
    val grid = events.select(col(keyCol).as("key")).distinct()
      .select(col("key"),
        explode(sequence(gridStart, gridEnd, expr("INTERVAL 1 HOUR"))).as("bucket"))

    val wFill = Window.partitionBy("key").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // pre-grid buckets join the fill DOMAIN (so state observed before
    // gridStart carries into the first grid buckets) but are dropped from
    // the output after the window pass — without them a clipped window
    // would forward-fill null until the key's first in-window event
    val dom = grid.join(buckets, Seq("key", "bucket"), "left")
      .select(col("key"), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("last_v"), lit(true).as("_in_grid"))
      .unionByName(buckets.filter(col("bucket") < gridStart)
        .select(col("key"), col("bucket"), col("n_events"),
          col("last_v"), lit(false).as("_in_grid")))
    dom.select(col("key"), col("bucket"), col("n_events"),
        last(col("last_v"), ignoreNulls = true).over(wFill).as("value_ffill"),
        col("_in_grid"))
      .filter(col("_in_grid"))
      .drop("_in_grid")
  }
}
