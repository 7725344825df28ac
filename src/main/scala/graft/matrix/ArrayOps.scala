package graft.matrix

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Row-wise (per-sample) operations in the array layout (SURVEY §7.2.1).
  *
  * The reference's feature matrix is extremely wide (up to 60k gene columns);
  * 60k Catalyst attributes per plan is the #1 design risk, so the engine's
  * canonical layout is `(row_id, meta…, features: ArrayType(Double))`.
  * Row-wise aggregates (A4: `q75(row)/sum(row)` — the UpperQuartile factor,
  * `feature_selection_and_normalization.py:27-28,53-55`) and elementwise maps
  * (F1 `log2(x+1)`, F4 row scaling) become single codegen'd higher-order
  * expressions — one pass, zero shuffle, any width.
  */
object ArrayOps {

  /** Build an array column from named columns (wide→array, X4-analog for
    * narrow inputs; genuinely wide inputs use VectorAssembler / one-time
    * re-write, SURVEY §7.4.1). Elements cast to double. */
  def toArray(cols: Seq[Column]): Column =
    array(cols.map(_.cast("double")): _*)

  /** Order-independent exact row sum: decimal-accumulator left fold, result
    * as double. Oracle-parity twin of [[graft.util.Parity.dsum6]] at row
    * granularity. */
  def rowSumExact(arr: Column): Column =
    aggregate(
      arr,
      lit(BigDecimal(0)).cast("decimal(38,6)"),
      (acc, x) => acc + x.cast("decimal(28,6)")
    ).cast("double")

  /** Plain sequential double row sum (left fold — deterministic order). */
  def rowSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x.cast("double"))

  /** A4 — exact linear-interpolation (type-7 / numpy default) quantile of
    * an array row, matching `np.quantile`/`pd.quantile` used at
    * `feature_selection_and_normalization.py:27,53`. One expression, no
    * shuffle, `O(k log k)` per row. Backed by the native codegen'd
    * [[graft.functions.ArrayQuantileT7]]; bit-identical to
    * [[rowQuantileComposed]] (property-tested). */
  def rowQuantile(arr: Column, q: Double): Column =
    org.apache.spark.sql.graft.ArrayQuantileT7(arr, q)

  /** Built-ins-only formulation of [[rowQuantile]] (`array_sort` +
    * `element_at` + interpolation) — the parity reference for the native
    * expression, and the fallback if an environment forbids custom
    * Catalyst nodes. */
  def rowQuantileComposed(arr: Column, q: Double): Column = {
    val sorted = array_sort(transform(arr, _.cast("double")))
    val n = size(arr)
    // pos = (n-1)*q; val = a[lo] + (a[hi]-a[lo]) * (pos-lo)   (1-based element_at)
    val pos = (n - lit(1)).cast("double") * lit(q)
    val lo = floor(pos).cast("int")
    val hi = ceil(pos).cast("int")
    val vlo = element_at(sorted, lo + 1)
    val vhi = element_at(sorted, hi + 1)
    vlo + (vhi - vlo) * (pos - lo.cast("double"))
  }

  /** F1 — variance-stabilizing log2(x+1), elementwise
    * (`functions/dask_pipeline.py:43`). */
  def log2p1(arr: Column): Column =
    transform(arr, x => log2(x.cast("double") + lit(1.0)))

  /** F4 — broadcast row scaling: every element times a per-row factor
    * (`feature_selection_and_normalization.py:31,58`). Native
    * [[org.apache.spark.sql.graft.ScaleRow]]: the composed
    * `transform(arr, x => x * factor)` evaluates the factor expression per
    * ELEMENT (lambda bodies re-run their free subtrees), which turns
    * O(width²) when the factor is itself a per-row reduction — found at
    * 40k width by the scaling bench. */
  def scaleRow(arr: Column, factor: Column): Column =
    org.apache.spark.sql.graft.ScaleRow(arr, factor)

  /** The composed lambda formulation — parity reference for the native
    * [[scaleRow]]; do not use with expensive factor expressions. */
  def scaleRowComposed(arr: Column, factor: Column): Column =
    transform(arr, x => x.cast("double") * factor)

  /** P5 — positive-value filter within a row
    * (`feature_selection_and_normalization.py:74`). */
  def positives(arr: Column): Column =
    filter(arr, _ > lit(0))

  /** P6 — conditional replace within a row (`replace(0, 1)`,
    * `feature_selection_and_normalization.py:24,50`). */
  def replaceValue(arr: Column, from: Double, to: Double): Column =
    transform(arr, x => when(x === lit(from), lit(to)).otherwise(x.cast("double")))

  /** Dot product of two equal-length numeric arrays (sequential fold). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def l2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two arrays (brute-force baseline for ANN). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2(a) * l2(b))
}
