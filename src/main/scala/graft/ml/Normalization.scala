package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.matrix.ArrayOps
import graft.util.Parity

/** Normalization estimators re-expressing the reference's custom
  * sklearn-style transformers (SURVEY §2.9 M1/M2) over the array layout
  * `(meta…, features: ArrayType(Double))`.
  *
  * Reference: `functions/feature_selection_and_normalization.py`
  * (UpperQuartile `:8-31`, UpperQuartileDask `:34-58`, TMM `:61-115`;
  * itself adapted from edgeR's calcNormFactors and verified against a
  * published worked example — our unit tests replay the same algebra).
  *
  * fit/transform split follows MLlib convention: `fit` runs the stats jobs
  * (column mask, geometric mean, pseudo-reference) and captures *scalars /
  * small vectors* in the model; `transform` is a pure, single-pass,
  * shuffle-free column expression — the shape that scales to 100 TB.
  */
object Normalization {

  /** Mask an array column down to the given 0-based positions. */
  def maskPositions(features: Column, kept: Seq[Int], width: Int): Column =
    if (kept.size == width) features
    else transform(lit(kept.toArray), i => element_at(features, i + 1))

  /** Per-position (gene) means across all rows, via a single MLlib-style
    * tree aggregation — no shuffle of row data. */
  def positionMeans(df: DataFrame, featuresCol: String): Array[Double] = {
    val n = df.count().toDouble
    val width = df.select(size(col(featuresCol))).head().getInt(0)
    val sums = df.select(col(featuresCol)).rdd
      .treeAggregate(new Array[Double](width))(
        seqOp = (acc, row) => {
          val a = row.getSeq[Double](0); var i = 0
          while (i < acc.length) { acc(i) += a(i); i += 1 }; acc
        },
        combOp = (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a })
    sums.map(_ / n)
  }

  /** M1 — UpperQuartile normalization (`:8-31`).
    *
    * fit: drop all-zero genes (per-gene mean > 0, P2 mask); per-row norm
    * factor = q75(row) / sum(row); symmetrize so factors multiply to 1 by
    * dividing by their geometric mean (zeros replaced by 1 before log).
    * transform: scale each row by its factor.
    */
  class UpperQuartile(val q: Double = 0.75, val featuresCol: String = "features") {

    /** Per-row norm factor over already-masked features: q75(row)/sum(row). */
    def normFactor(features: Column): Column =
      ArrayOps.rowQuantile(features, q) / ArrayOps.rowSum(features)

    /** Callers with a single-split local input should pass it through
      * [[graft.relational.Scale.fanOut]] (ideally cached — fit runs four
      * actions) so the per-row stat math parallelizes; fit itself does not
      * repartition, because an un-cached repartition would re-shuffle on
      * every one of those actions. */
    def fit(df: DataFrame): UpperQuartileModel = {
      val means = positionMeans(df, featuresCol)
      val kept = means.indices.filter(i => means(i) > 0.0)
      val masked = maskPositions(col(featuresCol), kept, means.length)
      val nf = normFactor(masked)
      // geometric mean via exact-decimal mean of logs (Parity-deterministic)
      val lnNf = log(when(nf === 0.0, 1.0).otherwise(nf))
      val gm = df
        .select((Parity.dsum6(lnNf) / count(lit(1))).as("m"))
        .head().getDouble(0)
      new UpperQuartileModel(q, featuresCol, kept, means.length, math.exp(gm))
    }
  }

  class UpperQuartileModel(val q: Double, val featuresCol: String,
                           val kept: Seq[Int], val width: Int, val geoMean: Double) {
    def masked: Column = maskPositions(col(featuresCol), kept, width)
    def normFactor: Column = ArrayOps.rowQuantile(masked, q) / ArrayOps.rowSum(masked)
    def scalingFactor: Column = normFactor / lit(geoMean)
    /** Row-scale the (masked) feature array by the learned factor (F4). */
    def transform(df: DataFrame): DataFrame =
      df.withColumn(featuresCol, ArrayOps.scaleRow(masked, scalingFactor))
  }

  /** M2 — TMM normalization (`:61-115`): trimmed mean of the absolute
    * expression values vs. a pseudo-reference sample.
    *
    * fit pipeline (faithful to the reference, including its quirks):
    *  1. keep genes nonzero in ANY row (`:73`);
    *  2. pseudoref per gene g = q75 of positive values of g / sum of g (`:74`);
    *  3. per row r, gene g>0: log_ratio = (S−g)/(S·g) with S = Σ positives(r)
    *     (`:96-100`); abs_expr = (log2(num)/log2(den))/2 over the
    *     (g>0 ∨ ref>0) mask with 0→1 replacement (`:102-112`);
    *     ±inf → NaN (`:85-86`);
    *  4. GLOBAL trim thresholds: nanquantiles of the whole log_ratio matrix
    *     at (t, 1−t), of abs_expr at (s, 1−s) (`:88-92`);
    *  5. per-row factor = mean of abs_expr over genes strictly inside both
    *     trims (`:94` — `(lr·ae)/lr ≡ ae` on the joint non-NaN mask);
    *  6. symmetrize by geometric mean as in UQ (`:78`).
    */
  class TMM(val logRatioTrim: Double = 0.3, val absExprTrim: Double = 0.05,
            val featuresCol: String = "features",
            val exact: Boolean = true,
            val percentileAccuracy: Int = 50000,
            val sketchPartitions: Int = 8) {

    /** Quantile mode. `exact=true` → Spark's interpolating `percentile`,
      * bit-matching numpy's type-7 `nanquantile` (`:88-92`) — but it buffers
      * and sorts every value, which is catastrophic on an exploded 100 TB
      * matrix. `exact=false` → `approx_percentile` (mergeable single-pass GK
      * sketch, rank error ≤ 1/accuracy, no interpolation): trim thresholds
      * shift by at most a handful of borderline genes, factors move ~1e-6 —
      * the scale mode. */
    private def pctl(c: String, q: Double): Column =
      if (exact) expr(s"percentile($c, $q)")
      else expr(s"approx_percentile($c, $q, $percentileAccuracy)")

    /** Shared fit body through the trim thresholds: returns a gm→model
      * constructor plus the still-persisted ratio matrix and the factor
      * expression over it (callers run the one remaining geometric-mean
      * pass over whichever cache they keep, then release). */
    private def fitInternal(df0: DataFrame): (Double => TMMModel, DataFrame, Column) = {
      // the whole fit is CPU-bound map-side math over the scan — fan a
      // single-split local file across the cluster first (no-op at scale).
      // PERSISTED because two actions read it (the colstats aggregate and
      // the ratio-matrix cache build): an un-cached repartition re-runs
      // the scan + shuffle per action (the recorded q54 2× trap); released
      // below once the ratio matrix is materialized.
      val df = graft.relational.Scale.fanOut(df0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // bound the number of partial quantile states feeding any percentile
      // aggregate: a GK partial at accuracy 50k is nearly data-sized, so
      // the single-task final merge DEGRADES with partition count (measured
      // 2× worse at 32 partials than at 1); a handful of partials keeps
      // inserts parallel and the merge trivial. The same bound is mandatory
      // at cluster scale — a sketch agg over 10k scan tasks would funnel
      // 10k near-data-sized partials into one reducer without it.
      def sketchIn(frame: DataFrame): DataFrame =
        frame.coalesce(math.max(1, sketchPartitions))
      // probe width on the PRE-fan frame: limit pushdown reads one row from
      // the scan; through the repartition it would shuffle everything
      val width = df0.select(size(col(featuresCol))).head().getInt(0)

      // 1-2. per-position (nnz, q75-of-positives, colsum) as (Long, Double,
      // Double). colsum goes through exact DECIMAL: combine-order
      // independent (same factors at any partitioning/cluster size) and
      // bit-replayable by the DuckDB oracle; exact for inputs with ≤6
      // fractional digits, ≤1e-6 relative rounding otherwise.
      //
      // Two physically different, value-identical plans: narrow matrices
      // aggregate element_at projections directly (single codegen'd pass,
      // no row multiplication — measured ~3× faster than the explode at
      // width 4); wide matrices explode + hash-agg (3·width aggregate
      // buffers in one task would not fit at 60k genes, exploded rows
      // partial-aggregate fine).
      val colStats: Map[Int, (Long, Double, Double)] =
        if (width <= 256) {
          val aggs = (0 until width).flatMap { i =>
            val xi = s"element_at($featuresCol, ${i + 1})"
            Seq(
              expr(s"sum(CASE WHEN $xi != 0.0 THEN 1 ELSE 0 END)").as(s"nnz_$i"),
              pctl(s"CASE WHEN $xi > 0 THEN $xi END", 0.75).as(s"q_$i"),
              expr(s"CAST(sum(CAST($xi AS DECIMAL(38,6))) AS DOUBLE)").as(s"s_$i"))
          }
          val r = sketchIn(df).agg(aggs.head, aggs.tail: _*).head()
          (0 until width).map { i =>
            i -> (r.getLong(3 * i),
              if (r.isNullAt(3 * i + 1)) Double.NaN else r.getDouble(3 * i + 1),
              r.getDouble(3 * i + 2))
          }.toMap
        } else {
          df.select(posexplode(col(featuresCol)).as(Seq("pos", "x")))
            .groupBy("pos").agg(
              sum(when(col("x") =!= 0.0, 1).otherwise(0)).as("nnz"),
              pctl("CASE WHEN x > 0 THEN x END", 0.75).as("q75pos"),
              sum(col("x").cast(org.apache.spark.sql.types.DecimalType(38, 6))).cast("double").as("colsum"))
            .collect().map { r =>
              r.getInt(0) -> (r.getLong(1),
                if (r.isNullAt(2)) Double.NaN else r.getDouble(2),
                r.getDouble(3))
            }.toMap
        }
      val kept = (0 until width).filter(i => colStats(i)._1 > 0)
      val pseudoref = kept.map(i => colStats(i)._2 / colStats(i)._3).toArray

      val masked = maskPositions(col(featuresCol), kept, width)

      // 3. materialize per-row log_ratio / abs_expr arrays ONCE (row scalars
      // hoisted to columns so they're evaluated once per row, not per
      // element; the whole fit then runs its stat jobs over this cache).
      // The cache holds key columns + __r ONLY — carrying the source
      // feature array through it roughly doubles the bytes/row for no
      // reader (every downstream job touches just __r).
      val mat = withRatioArrays(df, masked, pseudoref).drop(featuresCol)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

      // 4. global nan-skipping quantiles of both matrices (A6) in ONE scan
      // of the cache: zip the (lr, ae) arrays, explode once, mask each side
      // into its own quantile aggregate (null-skipping). Same multisets as
      // separate explodes — the former two-scan union was ~2× the cost.
      val z = sketchIn(mat).select(explode(zip_with(col("__r.lr"), col("__r.ae"),
          (l, a) => struct(l.as("l"), a.as("a")))).as("z"))
        .select(col("z.l").as("l"), col("z.a").as("a"))
      def masked_(c: String) = s"CASE WHEN $c IS NOT NULL AND NOT isnan($c) THEN $c END"
      val tr = z.agg(
        pctl(masked_("l"), logRatioTrim).as("lr_lo"),
        pctl(masked_("l"), 1 - logRatioTrim).as("lr_hi"),
        pctl(masked_("a"), absExprTrim).as("ae_lo"),
        pctl(masked_("a"), 1 - absExprTrim).as("ae_hi")).head()
      val (lrLo, lrHi) = (tr.getDouble(0), tr.getDouble(1))
      val (aeLo, aeHi) = (tr.getDouble(2), tr.getDouble(3))
      df.unpersist() // ratio matrix is materialized; the fanned source is done

      // 5. per-row trimmed mean; the geometric-mean symmetrization (6) is
      // the caller's one remaining pass — fit() runs it over the ratio
      // cache, fitScored() over its own slimmer factor cache.
      val factor = trimmedMean(col("__r.lr"), col("__r.ae"), lrLo, lrHi, aeLo, aeHi)
      val mkModel = (gm: Double) => new TMMModel(featuresCol, kept, width, gm, pseudoref,
        lrLo, lrHi, aeLo, aeHi, logRatioTrim, absExprTrim)
      (mkModel, mat, factor)
    }

    def fit(df: DataFrame): TMMModel = {
      val (mkModel, mat, factor) = fitInternal(df)
      val lnNf = log(when(factor === 0.0, 1.0).otherwise(factor))
      val gm = mat.select((Parity.dsum6(lnNf) / count(lit(1))).as("m")).head().getDouble(0)
      mat.unpersist()
      mkModel(math.exp(gm))
    }

    /** Fit AND score the fitted dataset in one go: the factor column is
      * materialized ONCE into a keys+factor cache; the geometric-mean pass
      * then reads that cached scalar instead of re-deriving the trimmed
      * mean, and the returned frame derives `scaleCol` lazily from it
      * (saves a full re-derivation pass over `df` plus a fat second cache
      * vs fit-then-score — ~1/3 of q28's wall time). */
    def fitScored(df: DataFrame, normCol: String = "norm_factor",
                  scaleCol: String = "scaling_factor"): (TMMModel, DataFrame) = {
      val (mkModel, mat, factor) = fitInternal(df)
      val scored = mat.withColumn(normCol, factor).drop("__r")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nf = col(normCol)
      val lnNf = log(when(nf === 0.0, 1.0).otherwise(nf))
      val gm = scored.select((Parity.dsum6(lnNf) / count(lit(1))).as("m")).head().getDouble(0)
      mat.unpersist()
      val model = mkModel(math.exp(gm))
      // re-persist the FINAL frame and release the intermediate: Spark's
      // non-cascading uncache matches by plan, so handing back a projection
      // over the factor cache would leave the caller unable to release it
      // (unpersist on the projection is a silent no-op). The extra pass is
      // one cheap projection over the cached keys+factor rows.
      val result = scored.withColumn(scaleCol, nf / lit(model.geoMean))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      result.count()
      scored.unpersist()
      (model, result)
    }
  }

  /** Append the per-row (log-ratio `:96-100`, abs-expr `:102-112`) arrays
    * as one struct column `__r` — a single one-pass native expression
    * ([[org.apache.spark.sql.graft.TmmRatios]]); the previous 8-layer HOF
    * chain allocated an array per layer per row and dominated TMM fit. */
  def withRatioArrays(df: DataFrame, masked: Column, pseudoref: Array[Double]): DataFrame =
    df.withColumn("__r", org.apache.spark.sql.graft.TmmRatios(masked, pseudoref))

  /** Mean of `ae` over positions strictly inside both trim windows (`:94`)
    * — one pass via the native [[org.apache.spark.sql.graft.TrimmedMean]]
    * (the composed zip/filter/fold chain allocated three arrays + a struct
    * accumulator per row and dominated the factor jobs). */
  def trimmedMean(lr: Column, ae: Column,
                  lrLo: Double, lrHi: Double, aeLo: Double, aeHi: Double): Column =
    org.apache.spark.sql.graft.TrimmedMean(lr, ae, lrLo, lrHi, aeLo, aeHi)

  /** The composed zip_with/filter/aggregate formulation — parity reference
    * for the native [[trimmedMean]] (see NormalizationSpec); do not use on
    * the hot path. */
  def trimmedMeanComposed(lr: Column, ae: Column,
                          lrLo: Double, lrHi: Double, aeLo: Double, aeHi: Double): Column = {
    val zipped = zip_with(lr, ae, (l, a) =>
      when(l.isNotNull && !isnan(l) && l > lrLo && l < lrHi &&
           a.isNotNull && !isnan(a) && a > aeLo && a < aeHi, a))
    aggregate(
      filter(zipped, _.isNotNull),
      struct(lit(0.0).as("s"), lit(0L).as("n")),
      (acc, x) => struct((acc("s") + x).as("s"), (acc("n") + 1L).as("n")),
      acc => when(acc("n") > 0, acc("s") / acc("n").cast("double")))
  }

  class TMMModel(val featuresCol: String, val kept: Seq[Int], val width: Int,
                 val geoMean: Double, val pseudoref: Array[Double],
                 val lrLo: Double, val lrHi: Double, val aeLo: Double, val aeHi: Double,
                 val logRatioTrim: Double, val absExprTrim: Double) {
    def masked: Column = maskPositions(col(featuresCol), kept, width)
    /** Score a dataframe with per-row (norm_factor, scaling_factor) columns —
      * single pass over materialized ratio arrays. */
    def withFactors(df: DataFrame, normCol: String = "norm_factor",
                    scaleCol: String = "scaling_factor"): DataFrame = {
      val mat = withRatioArrays(df, masked, pseudoref)
      val nf = trimmedMean(col("__r.lr"), col("__r.ae"), lrLo, lrHi, aeLo, aeHi)
      mat.withColumn(normCol, nf)
        .withColumn(scaleCol, col(normCol) / lit(geoMean))
        .drop("__r")
    }
    def transform(df: DataFrame): DataFrame =
      withFactors(df).withColumn(featuresCol, ArrayOps.scaleRow(masked, col("scaling_factor")))
        .drop("norm_factor", "scaling_factor")
  }
}
