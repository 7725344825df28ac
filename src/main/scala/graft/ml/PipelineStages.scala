package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.feature.{StandardScaler, StringIndexer, VectorAssembler}
import graft.util.Parity

/** Pre-ML pipeline stages (SURVEY §2.9 M5/M6): label encoding and
  * standardization, in two flavors each —
  *
  *  - the MLlib estimator (`StringIndexer`, `StandardScaler`) for real
  *    pipelines (`functions/dask_pipeline.py:63-74`), and
  *  - a Parity-deterministic relational formulation used by the
  *    oracle-checked queries (engine-native semantics are identical;
  *    the relational one is also what you'd run at 100 TB to avoid
  *    driver-side label maps).
  */
object PipelineStages {

  /** M5 — label → dense index, frequency-descending with alphabetical
    * tie-break (MLlib StringIndexer's default `frequencyDesc` order, which
    * mirrors sklearn LabelEncoder's determinism guarantee of
    * `functions/dask_pipeline.py:63-66` at the semantics level). */
  def fitLabelIndex(df: DataFrame, labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(labelCol).agg(count(lit(1)).as("__cnt"))
    val w = Window.orderBy(col("__cnt").desc, col(labelCol).asc)
    // dense_rank over a global order of DISTINCT labels: the window input is
    // one row per label (already aggregated), so the single-partition window
    // is over |labels| rows, not |data| — fine at any scale.
    counts.select(col(labelCol), (row_number().over(w) - 1).cast("double").as("label_index"))
  }

  /** Apply a fitted label index (broadcast join — the labels table is tiny). */
  def encodeLabels(df: DataFrame, labelIndex: DataFrame, labelCol: String): DataFrame =
    df.join(broadcast(labelIndex), Seq(labelCol), "left")

  /** MLlib flavor of M5. */
  def stringIndexer(labelCol: String, outCol: String): StringIndexer =
    new StringIndexer().setInputCol(labelCol).setOutputCol(outCol)
      .setStringOrderType("frequencyDesc").setHandleInvalid("keep")

  /** M6 — z-score standardization of a numeric column with
    * Parity-deterministic mean/variance (exact decimal moments), so
    * `(x − μ) / σ` is bit-identical across engines. */
  def standardize(df: DataFrame, c: String, outCol: String): DataFrame = {
    val stats = df.agg(Parity.davg(col(c)).as("mu"), Parity.dvar(col(c)).as("v"))
    df.crossJoin(broadcast(stats))
      .withColumn(outCol, (col(c) - col("mu")) / sqrt(col("v")))
      .drop("mu", "v")
  }

  /** MLlib flavor of M6 over a features vector
    * (`StandardScaler(withMean=True)`, `functions/dask_pipeline.py:72`). */
  def standardScaler(inputCol: String, outputCol: String): StandardScaler =
    new StandardScaler().setInputCol(inputCol).setOutputCol(outputCol)
      .setWithMean(true).setWithStd(true)

  /** X4 — wide columns → MLlib Vector (`to_dask_array` analog,
    * `functions/dask_pipeline.py:48-52`). */
  def assembler(inputCols: Seq[String], outputCol: String): VectorAssembler =
    new VectorAssembler().setInputCols(inputCols.toArray).setOutputCol(outputCol)

  /** Array[Double] column → MLlib Vector column (for model training). */
  def arrayToVector(c: Column): Column =
    org.apache.spark.ml.functions.array_to_vector(c)

  /** Quartile break points of `c` as a 1-row (b1, b2, b3) frame.
    *
    * `exact=true` → Spark's interpolating `percentile`: bit-matches the
    * oracle's `quantile_cont`, and boundaries interpolate strictly between
    * adjacent sorted data values, so assignment is ULP-robust across
    * engines — but it buffers EVERY value into one aggregation state
    * (oracle-only at 100 TB). `exact=false` → `approx_percentile`
    * (mergeable single-pass GK sketch, rank error ≤ 1/accuracy, returns
    * real data values): the scale mode, tolerance-gated by q87's oracle —
    * the same exact/approx split as TMM (`Normalization.pctl`). */
  def quantileBreaks(df: DataFrame, c: String,
                     exact: Boolean = true, accuracy: Int = 10000): DataFrame = {
    // breaks agg NOT fanned: the exact percentile's partial buffering
    // parallelizes only modestly (merge is a concat), and the fan-out
    // shuffle of the raw column measured NET-negative cold
    // (2.5 → 3.2 s at sf0.1)
    val agg =
      if (exact) expr(s"percentile($c, array(0.25, 0.5, 0.75))")
      else expr(s"approx_percentile($c, array(0.25, 0.5, 0.75), $accuracy)")
    df.agg(agg.as("__bks"))
      .select(col("__bks")(0).cast("double").as("b1"),
        col("__bks")(1).cast("double").as("b2"),
        col("__bks")(2).cast("double").as("b3"))
  }

  /** Bucket `c` by a precomputed (b1, b2, b3) break frame: assignment via a
    * broadcast 1-row cross, never a per-row subquery. */
  def binByBreaks(df: DataFrame, c: String, out: String, breaks: DataFrame): DataFrame =
    df.crossJoin(broadcast(breaks))
      .withColumn(out,
        when(col(c) <= col("b1"), 0L)
          .when(col(c) <= col("b2"), 1L)
          .when(col(c) <= col("b3"), 2L)
          .otherwise(3L))
      .drop("b1", "b2", "b3")

  /** Quantile discretization (the KBinsDiscretizer shape): ONE aggregation
    * pass for the breaks, then [[binByBreaks]] assignment. */
  def quantileBin(df: DataFrame, c: String, out: String,
                  exact: Boolean = true, accuracy: Int = 10000): DataFrame =
    binByBreaks(df, c, out, quantileBreaks(df, c, exact, accuracy))
}
