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

  /** Run the full slice. `df` must carry (idCol: long, featuresCol:
    * Array[Double] — positive values, FPKM-like, labelCol: string). */
  def run(df: DataFrame, idCol: String, featuresCol: String, labelCol: String,
          cvFolds: Int = 3, maskQuantile: Double = 0.25): Result = {

    // M1 — UpperQuartile normalization (fit + transform on the load)
    val uq = new Normalization.UpperQuartile(0.75, featuresCol).fit(df)
    val normalized = uq.transform(df)
      .persist(StorageLevel.MEMORY_AND_DISK) // reference persists post-normalize

    // P3 — stats-driven feature mask: mean AND var above their own q25
    val (means, vars) = positionStats(normalized, featuresCol)
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
    val accuracy = Models.accuracy("label_index").evaluate(model.transform(testReady))

    // M7/A8 — parallel K-fold CV on the training set
    val cvScores = Models.kFoldCv(trainReady, cvFolds, idCol,
      tr => { val m = rf.fit(tr); te => m.transform(te) },
      scoredDf => Models.accuracy("label_index").evaluate(scoredDf))
    val cvMean = cvScores.sum / cvScores.size
    val cvVar = cvScores.map(s => (s - cvMean) * (s - cvMean)).sum / cvScores.size

    val result = Result(train.count(), test.count(), kept.size, accuracy, cvMean, cvVar)
    trainReady.unpersist(); train.unpersist(); normalized.unpersist()
    result
  }
}
