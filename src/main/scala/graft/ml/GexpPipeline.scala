package graft.ml

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.matrix.ArrayOps

/** The reference's flagship workload end-to-end
  * (`functions/dask_pipeline.py:124-157`, SURVEY §7.5 minimum slice):
  *
  *   load matrix → UpperQuartile-normalize (M1) → mean/var
  *   quantile-threshold feature mask (P3) → log2(x+1) (F1) → seeded 70/30
  *   split (M3) → label-encode fit-on-train (M5) → standardize fit-on-train
  *   (M6) → RandomForest (M8, multiclass default per SURVEY §7.3) →
  *   held-out accuracy (M12) + parallel K-fold CV mean/var (M7/A8).
  *
  * Array layout throughout (SURVEY §7.2.1): the matrix is one
  * `ArrayType(Double)` column, so a 60k-gene input changes nothing in the
  * plan. Persist points mirror the reference's (post-normalize, post-split;
  * `dask_pipeline.py` X6 sites).
  */
object GexpPipeline {

  case class Result(nTrain: Long, nTest: Long, nFeaturesKept: Int,
                    accuracy: Double, cvMean: Double, cvVar: Double)

  /** Per-position (mean, variance) in one tree aggregation. */
  def positionStats(df: DataFrame, featuresCol: String): (Array[Double], Array[Double]) = {
    val width = df.select(size(col(featuresCol))).head().getInt(0)
    val z = (new Array[Double](width), new Array[Double](width), Array(0L))
    val (sums, sqs, n) = df.select(col(featuresCol)).rdd.treeAggregate(z)(
      seqOp = { case ((s, s2, n), row) =>
        val a = row.getSeq[Double](0); var i = 0
        while (i < s.length) { s(i) += a(i); s2(i) += a(i) * a(i); i += 1 }
        n(0) += 1; (s, s2, n)
      },
      combOp = { case ((s, s2, n), (t, t2, m)) =>
        var i = 0
        while (i < s.length) { s(i) += t(i); s2(i) += t2(i); i += 1 }
        n(0) += m(0); (s, s2, n)
      })
    val cnt = n(0).toDouble
    val means = sums.map(_ / cnt)
    val vars = sqs.indices.map(i => (sqs(i) - sums(i) * sums(i) / cnt) / (cnt - 1.0)).toArray
    (means, vars)
  }

  /** Per-position (mean, variance) via exact-decimal sums over one
    * explode + hash-aggregation (map-side partial combine; shuffles only
    * width × partitions pre-aggregated rows, the TMM-colstats shape).
    *
    * Unlike [[positionStats]]' double tree-aggregation, the decimal sums
    * are combine-order independent and bit-identical in any engine —
    * DECIMAL(38,18) captures every double exactly for |x| < ~1e19 — which
    * is what lets the q54 oracle replay the feature-mask decision in SQL.
    * Same O(n·k) work and scale shape; preferred when the downstream
    * decision (threshold comparisons) must be reproducible. */
  def positionStatsExact(df: DataFrame, featuresCol: String): (Array[Double], Array[Double]) = {
    import org.apache.spark.sql.types.DecimalType
    val rows = df.select(posexplode(col(featuresCol)).as(Seq("pos", "x")))
      .groupBy("pos").agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(DecimalType(38, 18))).cast("double").as("s"),
        sum((col("x") * col("x")).cast(DecimalType(38, 18))).cast("double").as("s2"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val width = rows.size
    val means = new Array[Double](width)
    val vars = new Array[Double](width)
    (0 until width).foreach { i =>
      val (n, s, s2) = rows(i)
      means(i) = s / n
      vars(i) = (s2 - s * s / n) / (n - 1.0)
    }
    (means, vars)
  }

  /** Run the full slice. `df` must carry (idCol: long, featuresCol:
    * Array[Double] — positive values, FPKM-like, labelCol: string).
    * `dump` (test-set scored DF, per-fold CV scored DF) runs while the
    * pipeline caches are alive — the differential-oracle hook. */
  def run(df: DataFrame, idCol: String, featuresCol: String, labelCol: String,
          cvFolds: Int = 3, maskQuantile: Double = 0.25,
          dump: Option[(DataFrame, DataFrame) => Unit] = None): Result = {

    // M1 — UpperQuartile normalization (fit + transform on the load)
    val uq = new Normalization.UpperQuartile(0.75, featuresCol).fit(df)
    val normalized = uq.transform(df)
      .persist(StorageLevel.MEMORY_AND_DISK) // reference persists post-normalize

    // P3 — stats-driven feature mask: mean AND var above their own q25
    // (exact-decimal stats so the mask decision is engine-reproducible)
    val (means, vars) = positionStatsExact(normalized, featuresCol)
    val tm = graft.relational.StatsProjection.quantileType7(means.toSeq, maskQuantile)
    val tv = graft.relational.StatsProjection.quantileType7(vars.toSeq, maskQuantile)
    val kept = means.indices.filter(i => means(i) > tm && vars(i) > tv)
    val masked = Normalization.maskPositions(col(featuresCol), kept, means.length)

    // F1 — log2(x+1), then to MLlib vector
    val prepared = normalized
      .withColumn(featuresCol, ArrayOps.log2p1(masked))
      .withColumn("features_vec",
        PipelineStages.arrayToVector(col(featuresCol)))

    // M3 — seeded 70/30 split (pure key hash; SURVEY §7.2.5)
    val train = DeterministicSplits.trainSplit(prepared, col(idCol), 0.7)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val test = DeterministicSplits.testSplit(prepared, col(idCol), 0.7)

    // M5 — label index FIT ON TRAIN, applied to both (reference order)
    val labelIndex = PipelineStages.fitLabelIndex(train, labelCol)
    def encoded(part: DataFrame) =
      PipelineStages.encodeLabels(part, labelIndex, labelCol)
        .na.drop(Seq("label_index")) // test labels unseen in train are dropped

    // M6 — standardize FIT ON TRAIN
    val scaler = PipelineStages.standardScaler("features_vec", "features_std")
      .fit(encoded(train))
    def scaled(part: DataFrame) = scaler.transform(encoded(part))

    val trainReady = scaled(train).persist(StorageLevel.MEMORY_AND_DISK)
    val testReady = scaled(test)

    // M8/M12 — RandomForest + held-out accuracy
    val rf = Models.randomForest("label_index", "features_std", numTrees = 30)
    val model = rf.fit(trainReady)
    val testScored = model.transform(testReady)
      .select(col(idCol), col("label_index"), col("prediction"))
    val accuracy = Models.accuracy("label_index").evaluate(testScored)

    // M7/A8 — parallel K-fold CV on the training set
    var cvPreds: DataFrame = null
    val cvScores = Models.kFoldCvWithPreds(trainReady, cvFolds, idCol,
      tr => { val m = rf.fit(tr); te => m.transform(te) },
      scoredDf => Models.accuracy("label_index").evaluate(scoredDf)) { folds =>
      cvPreds = folds.map { case (f, sdf) =>
        sdf.select(lit(f.toLong).as("fold"), col("label_index"), col("prediction"))
      }.reduce(_ unionByName _)
      dump.foreach(h => h(testScored, cvPreds)) // caches still alive here
    }
    val cvMean = cvScores.sum / cvScores.size
    val cvVar = cvScores.map(s => (s - cvMean) * (s - cvMean)).sum / cvScores.size

    val result = Result(train.count(), test.count(), kept.size, accuracy, cvMean, cvVar)
    trainReady.unpersist(); train.unpersist(); normalized.unpersist()
    result
  }
}
