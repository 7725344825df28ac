package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.io.Tables
import graft.ml.{DeterministicSplits, Models, Normalization, PipelineStages}
import graft.matrix.ArrayOps
import graft.util.Parity
import graft.util.Parity._

/** ML pipeline surface (SURVEY §2.9): deterministic seeded splits,
  * stratified sampling, label encoding, standardization, K-fold assignment
  * (oracle-checked) and MLlib model training / evaluation / random search
  * (rows-only — not SQL-expressible).
  */
object MLPack extends QueryPack {

  private val segFractions = Map(
    "AUTOMOBILE" -> 0.6, "BUILDING" -> 0.4, "FURNITURE" -> 0.5,
    "HOUSEHOLD" -> 0.2, "MACHINERY" -> 0.3)

  /** embeddings with MLlib vector features + double label, hash-split. */
  private def embeddingsML(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val df = Tables.embeddings(s, d).select(
      col("vec_id"),
      col("label").cast("double").as("label"),
      PipelineStages.arrayToVector(transform(col("embedding"), _.cast("double"))).as("features"))
    (DeterministicSplits.trainSplit(df, col("vec_id"), 0.7),
     DeterministicSplits.testSplit(df, col("vec_id"), 0.7))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // M6 — deterministic z-score standardization of order totals.
    "q19_standardized_prices" -> { (s, d) =>
      PipelineStages.standardize(Tables.orders(s, d), "o_totalprice", "z")
        .select(col("o_orderkey"), round(col("z"), 6).as("z"))
    },

    // M3 — seeded 70/30 train/test split as a pure key function.
    "q20_hash_split" -> { (s, d) =>
      Tables.orders(s, d)
        .withColumn("split", DeterministicSplits.splitTag(col("o_orderkey"), 0.7))
        .groupBy("split")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
    },

    // M4 — stratified sampling with per-stratum fractions.
    "q21_stratified_sample" -> { (s, d) =>
      DeterministicSplits.stratifiedSample(
        Tables.customer(s, d), col("c_custkey"), col("c_mktsegment"), segFractions)
        .select("c_custkey", "c_mktsegment")
    },

    // M5 — label encoding: frequency-desc with alphabetical tie-break.
    "q22_label_encode" -> { (s, d) =>
      PipelineStages.fitLabelIndex(Tables.customer(s, d), "c_mktsegment")
    },

    // M7 — disjoint exhaustive 10-fold assignment + per-fold aggregates.
    "q23_fold_counts" -> { (s, d) =>
      Tables.orders(s, d)
        .withColumn("fold", DeterministicSplits.foldId(col("o_orderkey"), 10))
        .groupBy("fold")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
    },

    // M8/M14 — RandomForest multiclass on embeddings (hash-split 70/30),
    // predictions on held-out set. Rows-only: model internals aren't
    // SQL-expressible.
    "q24_rf_predictions" -> { (s, d) =>
      val (train, test) = embeddingsML(s, d)
      val model = Models.randomForest("label", "features", numTrees = 20).fit(train)
      model.transform(test).select(col("vec_id"), col("label"), col("prediction"))
    },

    // M12 — held-out accuracy of the RF model (single-row result).
    "q25_rf_accuracy" -> { (s, d) =>
      val (train, test) = embeddingsML(s, d)
      val model = Models.randomForest("label", "features", numTrees = 20).fit(train)
      val acc = Models.accuracy("label").evaluate(model.transform(test))
      s.createDataFrame(Seq(Tuple2("rf_embeddings", acc))).toDF("model", "accuracy")
    },

    // M7 — parallel K-fold CV (concurrent fold jobs) with logistic
    // regression; per-fold accuracy scores.
    "q26_cv_scores" -> { (s, d) =>
      val df = Tables.embeddings(s, d).select(
        col("vec_id"), col("label").cast("double").as("label"),
        PipelineStages.arrayToVector(transform(col("embedding"), _.cast("double"))).as("features"))
      val scores = Models.kFoldCv(df, 3, "vec_id",
        tr => { val m = Models.logistic("label", "features").fit(tr); te => m.transform(te) },
        scored => Models.accuracy("label").evaluate(scored))
      s.createDataFrame(scores.zipWithIndex.map { case (sc, f) => (f.toLong, sc) })
        .toDF("fold", "accuracy")
    },

    // M11 — seeded random hyperparameter search over LinearSVC (binary
    // task: label < 5) — config + score per trial.
    "q27_random_search" -> { (s, d) =>
      val df = Tables.embeddings(s, d).select(
        col("vec_id"), (col("label") < 5).cast("double").as("label"),
        PipelineStages.arrayToVector(transform(col("embedding"), _.cast("double"))).as("features"))
      val train = DeterministicSplits.trainSplit(df, col("vec_id"), 0.7)
      val test = DeterministicSplits.testSplit(df, col("vec_id"), 0.7)
      val (_, _, all) = Models.randomSearch(
        Map("regParam" -> Seq(0.0, 0.01, 0.1), "maxIter" -> Seq(10, 20)), n = 4) { cfg =>
        val m = Models.linearSvc("label", "features")
          .setRegParam(cfg("regParam").asInstanceOf[Double])
          .setMaxIter(cfg("maxIter").asInstanceOf[Int])
          .fit(train)
        Models.accuracy("label").evaluate(m.transform(test))
      }
      s.createDataFrame(all.map { case (cfg, sc) =>
        (cfg("regParam").asInstanceOf[Double], cfg("maxIter").asInstanceOf[Int].toLong, sc)
      }).toDF("reg_param", "max_iter", "accuracy")
    },

    // M2 — TMM normalization factors on the lineitem 4-column matrix.
    // Rows-only (the full TMM dataflow is unit-tested; SQL oracle would
    // re-implement the whole estimator).
    "q28_tmm_factors" -> { (s, d) =>
      val li = Tables.lineitem(s, d).withColumn("features",
        ArrayOps.toArray(Seq(col("l_quantity"), col("l_extendedprice"),
          lit(1.0) + col("l_discount"), lit(1.0) + col("l_tax"))))
      val (_, scored) = new Normalization.TMM(0.3, 0.05, "features", exact = false).fitScored(li)
      scored.select(col("l_orderkey"), col("l_linenumber"),
        round(col("scaling_factor"), 6).as("scaling_factor"))
    },

    // The reference's flagship workload end-to-end (SURVEY §7.5 minimum
    // slice, `dask_pipeline.py:124-157`): UQ-normalize → P3 feature mask →
    // log2(x+1) → split → encode → scale → RandomForest → accuracy + CV.
    // Input: an FPKM-like positive matrix derived from the embeddings
    // table (exp transform), string class labels. Rows-only.
    "q54_gexp_pipeline" -> { (s, d) =>
      val gexp = Tables.embeddings(s, d).select(
        col("vec_id"),
        transform(col("embedding"), x => exp(x.cast("double")) * 10.0).as("features"),
        concat(lit("class_"), (col("label") % 3).cast("string")).as("subtype"))
      val r = graft.ml.GexpPipeline.run(gexp, "vec_id", "features", "subtype")
      s.createDataFrame(Seq((r.nTrain, r.nTest, r.nFeaturesKept.toLong,
          r.accuracy, r.cvMean, r.cvVar)))
        .toDF("n_train", "n_test", "n_features_kept", "accuracy", "cv_mean", "cv_var")
    }
  )

  private val unitHashSql: String => String =
    k => s"(CAST(${Parity.keyHashSql(k)} AS DOUBLE) / ${Parity.HashMod}.0)"

  override def oracles: Map[String, String] = Map(
    "q19_standardized_prices" ->
      s"""WITH s AS (SELECT ${Sql.davg("o_totalprice")} AS mu, ${Sql.dvar("o_totalprice")} AS v FROM orders)
          SELECT o_orderkey, round((o_totalprice - mu) / sqrt(v), 6) AS z FROM orders, s""",

    "q20_hash_split" ->
      s"""SELECT CASE WHEN ${unitHashSql("o_orderkey")} < 0.7 THEN 'train' ELSE 'test' END AS split,
          COUNT(*) AS n, ${Sql.dsum("o_totalprice")} AS sum_price
          FROM orders GROUP BY 1""",

    "q21_stratified_sample" -> {
      val cases = segFractions.map { case (k, f) => s"WHEN c_mktsegment = '$k' THEN $f" }.mkString(" ")
      s"""SELECT c_custkey, c_mktsegment FROM customer
          WHERE ${unitHashSql("c_custkey")} < (CASE $cases ELSE 0.0 END)"""
    },

    "q22_label_encode" ->
      """SELECT c_mktsegment,
           CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, c_mktsegment) - 1 AS DOUBLE) AS label_index
         FROM (SELECT c_mktsegment, COUNT(*) AS cnt FROM customer GROUP BY c_mktsegment)""",

    "q23_fold_counts" ->
      s"""SELECT ${Parity.keyHashSql("o_orderkey")} % 10 AS fold,
          COUNT(*) AS n, ${Sql.dsum("o_totalprice")} AS sum_price
          FROM orders GROUP BY 1"""
  )
}
