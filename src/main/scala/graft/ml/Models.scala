package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.ml.classification.{GBTClassifier, LinearSVC, LogisticRegression, RandomForestClassifier}
import org.apache.spark.ml.regression.{GBTRegressor, RandomForestRegressor}
import org.apache.spark.ml.evaluation.{MulticlassClassificationEvaluator, RegressionEvaluator}

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Model zoo + parallel cross-validation (SURVEY §2.9 M7–M14).
  *
  * Mapping from the reference:
  *  - XGB/LightGBM gradient boosting (`functions/dask_pipeline.py:79-104`,
  *    `cluster_default_benchmark.py:137-143`) → MLlib `GBTClassifier` /
  *    `GBTRegressor` ("distributed GBM" capability). GBTClassifier is
  *    binary-only, so the multiclass default is `RandomForestClassifier`
  *    (SURVEY §7.3).
  *  - `SGDClassifier(hinge, l2)` (`functions/dask_pipeline.py:109`) →
  *    `LinearSVC` (same hinge-loss linear-model family).
  *  - Parallel delayed K-fold CV (`functions/dask_cv.py:41-68`) → fold jobs
  *    submitted concurrently from Scala Futures against the shared
  *    SparkSession (Spark's scheduler plays Dask's scheduler role).
  *  - accuracy / R² (`:100,102`) → MLlib evaluators.
  */
object Models {
  val Seed = 42L

  def randomForest(labelCol: String, featuresCol: String, numTrees: Int = 50): RandomForestClassifier =
    new RandomForestClassifier().setLabelCol(labelCol).setFeaturesCol(featuresCol)
      .setNumTrees(numTrees).setSeed(Seed)

  def gbtClassifier(labelCol: String, featuresCol: String): GBTClassifier =
    new GBTClassifier().setLabelCol(labelCol).setFeaturesCol(featuresCol)
      .setMaxIter(20).setSeed(Seed)

  def gbtRegressor(labelCol: String, featuresCol: String): GBTRegressor =
    new GBTRegressor().setLabelCol(labelCol).setFeaturesCol(featuresCol)
      .setMaxIter(20).setSeed(Seed)

  /** TRUE multiclass gradient boosting: MLlib's GBTClassifier is
    * binary-only, so the reference's multiclass `XGBClassifier`
    * (`functions/dask_pipeline.py:83`) maps to one-vs-rest over K seeded
    * binary GBTs (SURVEY §7.3). The K fits are independent Spark jobs —
    * `parallelism` submits them concurrently, the exact shape of the
    * engine's concurrent CV/search fits; at cluster scale the K jobs'
    * stages interleave across executors. RF stays the cheaper multiclass
    * default; this is the boosting-family option. */
  def ovrGbt(labelCol: String, featuresCol: String, maxIter: Int = 10,
             parallelism: Int = 8): org.apache.spark.ml.classification.OneVsRest =
    new org.apache.spark.ml.classification.OneVsRest()
      .setClassifier(new GBTClassifier().setMaxIter(maxIter).setSeed(Seed))
      .setLabelCol(labelCol).setFeaturesCol(featuresCol)
      .setParallelism(parallelism)

  def rfRegressor(labelCol: String, featuresCol: String): RandomForestRegressor =
    new RandomForestRegressor().setLabelCol(labelCol).setFeaturesCol(featuresCol)
      .setNumTrees(50).setSeed(Seed)

  def linearSvc(labelCol: String, featuresCol: String): LinearSVC =
    new LinearSVC().setLabelCol(labelCol).setFeaturesCol(featuresCol).setMaxIter(50)

  def logistic(labelCol: String, featuresCol: String): LogisticRegression =
    new LogisticRegression().setLabelCol(labelCol).setFeaturesCol(featuresCol).setMaxIter(50)

  /** Seeded k-means (distributed Lloyd iterations over k-means|| init) —
    * the clustering shape for corpus curation: topic balancing, near-dup
    * cluster pruning, stratified corpus sampling. Deterministic given the
    * seed and data, so cluster assignments are differentially oracle-able
    * (the argmin-over-centroids property is plain SQL — see q80). */
  def kmeans(featuresCol: String, k: Int, maxIter: Int = 20): org.apache.spark.ml.clustering.KMeans =
    new org.apache.spark.ml.clustering.KMeans().setK(k).setSeed(Seed).setMaxIter(maxIter)
      .setTol(1e-9).setFeaturesCol(featuresCol).setPredictionCol("cluster")

  def accuracy(labelCol: String, predictionCol: String = "prediction"): MulticlassClassificationEvaluator =
    new MulticlassClassificationEvaluator().setLabelCol(labelCol)
      .setPredictionCol(predictionCol).setMetricName("accuracy")

  def r2(labelCol: String, predictionCol: String = "prediction"): RegressionEvaluator =
    new RegressionEvaluator().setLabelCol(labelCol)
      .setPredictionCol(predictionCol).setMetricName("r2")

  /** M7 — K-fold cross-validation with folds trained concurrently.
    *
    * Fold membership is the deterministic key hash
    * ([[DeterministicSplits.foldId]]) — disjoint, exhaustive, reproducible
    * under repartitioning. All K fit jobs are submitted at once from a
    * dedicated thread pool, reproducing the reference's single batched
    * `dask.compute(*scores)` (`functions/dask_cv.py:62-68`): Spark
    * interleaves the K jobs' stages across the cluster.
    */
  def kFoldCv(df: DataFrame, k: Int, keyCol: String,
              train: DataFrame => DataFrame => DataFrame, // trainDF => (testDF => scoredDF)
              score: DataFrame => Double): Seq[Double] =
    kFoldCvWithPreds(df, k, keyCol, train, score)(_ => ())

  /** [[kFoldCv]] plus a post-hoc hook: after the concurrent fold jobs
    * complete, `use` receives the (fold, scored-test DF) pairs while the
    * fold cache is still alive — the plumbing that lets differential
    * oracles dump per-fold predictions (see [[graft.util.OracleDump]]). */
  def kFoldCvWithPreds(df: DataFrame, k: Int, keyCol: String,
                       train: DataFrame => DataFrame => DataFrame,
                       score: DataFrame => Double)(
                       use: Seq[(Int, DataFrame)] => Unit): Seq[Double] = {
    import org.apache.spark.sql.functions._
    val withFold = df.withColumn("__fold", DeterministicSplits.foldId(col(keyCol), k))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    withFold.count() // materialize once; every fold job reuses the cache
    val pool = Executors.newFixedThreadPool(k)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = (0 until k).map { f =>
        Future {
          val tr = withFold.filter(col("__fold") =!= f).drop("__fold")
          val te = withFold.filter(col("__fold") === f).drop("__fold")
          val scored = train(tr)(te)
          (score(scored), scored)
        }
      }
      val done = Await.result(Future.sequence(futures), Duration.Inf)
      use(done.map(_._2).zipWithIndex.map { case (s, f) => (f, s) })
      done.map(_._1)
    } finally {
      pool.shutdown()
      withFold.unpersist()
    }
  }

  /** M11 — seeded random hyperparameter search: sample `n` configs from the
    * given grid with a fixed-seed RNG, evaluate each via `eval`, return
    * (bestParams, bestScore, all). Mirrors `RandomizedSearchCV(n_iter,
    * random_state=42)` (`functions/dask_pipeline.py:107-120`) at the
    * semantics level. */
  /** M11 at the reference's full nesting (`dask_pipeline.py:108-115`:
    * `RandomizedSearchCV(n_iter, cv=2, random_state=42)` inside the outer
    * fold loop): an outer K-fold; inside each fold, the same seeded
    * candidate draw (the reference re-seeds per fold, so candidates repeat
    * across folds) scored by an inner `innerK`-fold CV on the fold's
    * training part; every (fold × candidate) job submitted concurrently so
    * Spark interleaves the many small fit jobs. Inner folds hash a shifted
    * key so they don't correlate with the outer assignment.
    *
    * Returns (all trials, per-fold argmax) as (fold, trial, config, score)
    * rows; ties break to the lowest trial (Seq.maxBy keeps the first).
    */
  def nestedRandomSearch(df: DataFrame, outerK: Int, innerK: Int, keyCol: String,
      grid: Map[String, Seq[Any]], nIter: Int, seed: Long = Seed)(
      fit: Map[String, Any] => DataFrame => DataFrame => DataFrame)( // cfg => train => (test => scored)
      score: DataFrame => Double)
      : (Seq[(Int, Int, Map[String, Any], Double)], Seq[(Int, Int, Map[String, Any], Double)]) = {
    import org.apache.spark.sql.functions._
    val configs = drawConfigs(grid, nIter, seed)
    val withFolds = df
      .withColumn("__ofold", DeterministicSplits.foldId(col(keyCol), outerK))
      .withColumn("__ifold", DeterministicSplits.foldId(col(keyCol) + lit(12345L), innerK))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    withFolds.count()
    val pool = Executors.newFixedThreadPool(16)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = for (f <- 0 until outerK; (cfg, t) <- configs.zipWithIndex) yield Future {
        val outerTrain = withFolds.filter(col("__ofold") =!= f)
        val innerScores = (0 until innerK).map { g =>
          val tr = outerTrain.filter(col("__ifold") =!= g).drop("__ofold", "__ifold")
          val te = outerTrain.filter(col("__ifold") === g).drop("__ofold", "__ifold")
          score(fit(cfg)(tr)(te))
        }
        (f, t, cfg, innerScores.sum / innerScores.size)
      }
      val trials = Await.result(Future.sequence(futures), Duration.Inf)
      val bests = (0 until outerK).map(f => trials.filter(_._1 == f).maxBy(_._4))
      (trials, bests)
    } finally {
      pool.shutdown()
      withFolds.unpersist()
    }
  }

  /** Seeded config draw shared by the flat and parallel searches
    * (sklearn `ParameterSampler` shape: n draws over the grid, duplicate
    * draws collapsed — `functions/dask_pipeline.py:108-115`). */
  def drawConfigs(grid: Map[String, Seq[Any]], n: Int, seed: Long = Seed): Seq[Map[String, Any]] = {
    val rng = new scala.util.Random(seed)
    val keys = grid.keys.toSeq.sorted
    (0 until n).map { _ =>
      keys.map(k => k -> grid(k)(rng.nextInt(grid(k).size))).toMap
    }.distinct
  }

  def randomSearch(grid: Map[String, Seq[Any]], n: Int, seed: Long = Seed)(
      eval: Map[String, Any] => Double): (Map[String, Any], Double, Seq[(Map[String, Any], Double)]) = {
    val scored = drawConfigs(grid, n, seed).map(c => c -> eval(c))
    val best = scored.maxBy(_._2)
    (best._1, best._2, scored)
  }

  /** M11 — flat random search with trials fitted CONCURRENTLY. Draws are
    * bit-identical to [[randomSearch]]; `eval` receives the stable trial
    * index so per-trial artifacts (prediction dumps) keep their identity
    * regardless of completion order. Results are ordered by trial index. */
  def randomSearchPar[T](grid: Map[String, Seq[Any]], n: Int, seed: Long = Seed)(
      eval: (Map[String, Any], Int) => (Double, T)): (Map[String, Any], Double, Seq[(Map[String, Any], Double, T)]) = {
    val configs = drawConfigs(grid, n, seed)
    val pool = Executors.newFixedThreadPool(math.max(1, math.min(16, configs.size)))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = configs.zipWithIndex.map { case (c, i) =>
        Future { val (score, extra) = eval(c, i); (c, score, extra) }
      }
      val scored = futures.map(Await.result(_, Duration.Inf))
      val best = scored.maxBy(_._2)
      (best._1, best._2, scored)
    } finally pool.shutdown()
  }
}
