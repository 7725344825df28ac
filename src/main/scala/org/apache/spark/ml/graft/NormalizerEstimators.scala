package org.apache.spark.ml.graft

import org.apache.hadoop.fs.Path
import org.apache.spark.ml.{Estimator, Model, PipelineStage}
import org.apache.spark.ml.param._
import org.apache.spark.ml.param.shared.HasFeaturesCol
import org.apache.spark.ml.util._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.types.{ArrayType, DoubleType, StructType}

import graft.ml.Normalization

/** MLlib `Estimator`/`Model` conformance for the engine's normalization
  * estimators (SURVEY §2.9 M1/M2).
  *
  * The reference's transformers are sklearn-protocol citizens
  * (`functions/feature_selection_and_normalization.py:8,34,61` — they extend
  * `BaseEstimator, TransformerMixin`, so they compose into sklearn
  * `Pipeline`s and pickle). The Spark analog of that contract is
  * `org.apache.spark.ml.Estimator[M]` / `Model[M]` with a `ParamMap` and
  * `MLWritable`/`MLReadable` persistence — these wrappers provide exactly
  * that over [[graft.ml.Normalization]]'s fit/transform engine, so the
  * normalizers sit in an `ml.Pipeline`, cross-validate under MLlib tooling,
  * and round-trip to disk like any built-in stage.
  *
  * Package note: lives under `org.apache.spark.ml.graft` (first-party graft
  * code, same pattern as the engine's Catalyst expressions in
  * `org.apache.spark.sql.graft`) so persistence uses MLlib's OWN
  * `DefaultParamsWriter`/`DefaultParamsReader` metadata format — which is
  * what lets a saved `PipelineModel` containing these stages be re-loaded by
  * the stock `PipelineModel.load` reflection path.
  *
  * The wrappers hold NO fit logic: `fit` delegates to the engine estimator
  * (whose plans are the ones audited for 100 TB shape) and captures only the
  * model's scalars / small vectors; `transform` is the same single-pass,
  * shuffle-free column expression. Save/load round-trips are bit-exact
  * (asserted in NormalizerEstimatorSpec).
  */
private[graft] trait UpperQuartileNormalizerParams extends Params with HasFeaturesCol {
  /** Row quantile used for the norm factor (the reference's q75). */
  final val quantile: DoubleParam = new DoubleParam(this, "quantile",
    "row quantile used for the normalization factor, in (0, 1]",
    ParamValidators.inRange(0.0, 1.0, lowerInclusive = false, upperInclusive = true))

  setDefault(quantile -> 0.75, featuresCol -> "features")

  protected def validateSchema(schema: StructType): StructType = {
    val f = schema($(featuresCol))
    require(f.dataType.isInstanceOf[ArrayType] &&
      f.dataType.asInstanceOf[ArrayType].elementType == DoubleType,
      s"column ${$(featuresCol)} must be array<double>, got ${f.dataType.simpleString}")
    schema // transform replaces the features column in place
  }
}

/** M1 — UpperQuartile normalization as a standard MLlib estimator. */
class UpperQuartileNormalizer(override val uid: String)
    extends Estimator[UpperQuartileNormalizerModel]
    with UpperQuartileNormalizerParams with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("uq_norm"))

  def setQuantile(value: Double): this.type = set(quantile, value)
  def setFeaturesCol(value: String): this.type = set(featuresCol, value)

  override def fit(dataset: Dataset[_]): UpperQuartileNormalizerModel = {
    transformSchema(dataset.schema, logging = true)
    val inner = new Normalization.UpperQuartile($(quantile), $(featuresCol))
    val m = inner.fit(dataset.toDF())
    copyValues(new UpperQuartileNormalizerModel(uid, m.kept.toArray, m.width, m.geoMean)
      .setParent(this))
  }

  override def transformSchema(schema: StructType): StructType = validateSchema(schema)
  override def copy(extra: ParamMap): UpperQuartileNormalizer = defaultCopy(extra)
}

object UpperQuartileNormalizer extends DefaultParamsReadable[UpperQuartileNormalizer] {
  override def load(path: String): UpperQuartileNormalizer = super.load(path)
}

class UpperQuartileNormalizerModel private[graft] (
    override val uid: String,
    val kept: Array[Int],
    val width: Int,
    val geoMean: Double)
    extends Model[UpperQuartileNormalizerModel]
    with UpperQuartileNormalizerParams with MLWritable {

  private def inner: Normalization.UpperQuartileModel =
    new Normalization.UpperQuartileModel($(quantile), $(featuresCol), kept.toSeq, width, geoMean)

  override def transform(dataset: Dataset[_]): DataFrame = {
    transformSchema(dataset.schema, logging = true)
    inner.transform(dataset.toDF())
  }

  override def transformSchema(schema: StructType): StructType = validateSchema(schema)

  override def copy(extra: ParamMap): UpperQuartileNormalizerModel =
    copyValues(new UpperQuartileNormalizerModel(uid, kept, width, geoMean), extra)
      .setParent(parent)

  override def write: MLWriter = new UpperQuartileNormalizerModel.Writer(this)
}

object UpperQuartileNormalizerModel extends MLReadable[UpperQuartileNormalizerModel] {

  private[UpperQuartileNormalizerModel] class Writer(instance: UpperQuartileNormalizerModel)
      extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      DefaultParamsWriter.saveMetadata(instance, path, sparkSession)
      val spark = sparkSession
      import spark.implicits._
      Seq((instance.kept.toSeq, instance.width, instance.geoMean))
        .toDF("kept", "width", "geo_mean")
        .repartition(1).write.parquet(new Path(path, "data").toString)
    }
  }

  private class Reader extends MLReader[UpperQuartileNormalizerModel] {
    private val className = classOf[UpperQuartileNormalizerModel].getName
    override def load(path: String): UpperQuartileNormalizerModel = {
      val metadata = DefaultParamsReader.loadMetadata(path, sparkSession, className)
      val row = sparkSession.read.parquet(new Path(path, "data").toString).head()
      val model = new UpperQuartileNormalizerModel(metadata.uid,
        row.getAs[Seq[Int]]("kept").toArray, row.getAs[Int]("width"),
        row.getAs[Double]("geo_mean"))
      metadata.getAndSetParams(model)
      model
    }
  }

  override def read: MLReader[UpperQuartileNormalizerModel] = new Reader
  override def load(path: String): UpperQuartileNormalizerModel = super.load(path)
}

private[graft] trait TMMNormalizerParams extends Params with HasFeaturesCol {
  final val logRatioTrim: DoubleParam = new DoubleParam(this, "logRatioTrim",
    "two-sided trim fraction for the log-ratio matrix", ParamValidators.inRange(0.0, 0.5))
  final val absExprTrim: DoubleParam = new DoubleParam(this, "absExprTrim",
    "two-sided trim fraction for the absolute-expression matrix", ParamValidators.inRange(0.0, 0.5))
  /** Exact interpolating percentile (oracle-parity; buffers every value)
    * vs the mergeable approx sketch (the 100 TB mode) — see
    * [[graft.ml.Normalization.TMM]]. */
  final val exact: BooleanParam = new BooleanParam(this, "exact",
    "exact percentile (oracle mode) vs approx_percentile sketch (scale mode)")
  final val percentileAccuracy: IntParam = new IntParam(this, "percentileAccuracy",
    "approx_percentile accuracy (rank error <= 1/accuracy)", ParamValidators.gt(0))

  setDefault(logRatioTrim -> 0.3, absExprTrim -> 0.05, exact -> true,
    percentileAccuracy -> 50000, featuresCol -> "features")

  protected def validateSchema(schema: StructType): StructType = {
    val f = schema($(featuresCol))
    require(f.dataType.isInstanceOf[ArrayType] &&
      f.dataType.asInstanceOf[ArrayType].elementType == DoubleType,
      s"column ${$(featuresCol)} must be array<double>, got ${f.dataType.simpleString}")
    schema
  }
}

/** M2 — TMM normalization as a standard MLlib estimator. */
class TMMNormalizer(override val uid: String)
    extends Estimator[TMMNormalizerModel]
    with TMMNormalizerParams with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("tmm_norm"))

  def setLogRatioTrim(value: Double): this.type = set(logRatioTrim, value)
  def setAbsExprTrim(value: Double): this.type = set(absExprTrim, value)
  def setExact(value: Boolean): this.type = set(exact, value)
  def setPercentileAccuracy(value: Int): this.type = set(percentileAccuracy, value)
  def setFeaturesCol(value: String): this.type = set(featuresCol, value)

  override def fit(dataset: Dataset[_]): TMMNormalizerModel = {
    transformSchema(dataset.schema, logging = true)
    val inner = new Normalization.TMM($(logRatioTrim), $(absExprTrim), $(featuresCol),
      exact = $(exact), percentileAccuracy = $(percentileAccuracy))
    val m = inner.fit(dataset.toDF())
    copyValues(new TMMNormalizerModel(uid, m.kept.toArray, m.width, m.geoMean,
      m.pseudoref, m.lrLo, m.lrHi, m.aeLo, m.aeHi).setParent(this))
  }

  override def transformSchema(schema: StructType): StructType = validateSchema(schema)
  override def copy(extra: ParamMap): TMMNormalizer = defaultCopy(extra)
}

object TMMNormalizer extends DefaultParamsReadable[TMMNormalizer] {
  override def load(path: String): TMMNormalizer = super.load(path)
}

class TMMNormalizerModel private[graft] (
    override val uid: String,
    val kept: Array[Int],
    val width: Int,
    val geoMean: Double,
    val pseudoref: Array[Double],
    val lrLo: Double, val lrHi: Double,
    val aeLo: Double, val aeHi: Double)
    extends Model[TMMNormalizerModel]
    with TMMNormalizerParams with MLWritable {

  private def inner: Normalization.TMMModel =
    new Normalization.TMMModel($(featuresCol), kept.toSeq, width, geoMean, pseudoref,
      lrLo, lrHi, aeLo, aeHi, $(logRatioTrim), $(absExprTrim))

  override def transform(dataset: Dataset[_]): DataFrame = {
    transformSchema(dataset.schema, logging = true)
    inner.transform(dataset.toDF())
  }

  /** The per-row (norm_factor, scaling_factor) scoring surface, exposed so
    * pipeline users can reach the factors themselves (the reference returns
    * them from `fit`). */
  def withFactors(df: DataFrame): DataFrame = inner.withFactors(df)

  override def transformSchema(schema: StructType): StructType = validateSchema(schema)

  override def copy(extra: ParamMap): TMMNormalizerModel =
    copyValues(new TMMNormalizerModel(uid, kept, width, geoMean, pseudoref,
      lrLo, lrHi, aeLo, aeHi), extra).setParent(parent)

  override def write: MLWriter = new TMMNormalizerModel.Writer(this)
}

object TMMNormalizerModel extends MLReadable[TMMNormalizerModel] {

  private[TMMNormalizerModel] class Writer(instance: TMMNormalizerModel) extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      DefaultParamsWriter.saveMetadata(instance, path, sparkSession)
      val spark = sparkSession
      import spark.implicits._
      Seq((instance.kept.toSeq, instance.width, instance.geoMean,
          instance.pseudoref.toSeq, instance.lrLo, instance.lrHi,
          instance.aeLo, instance.aeHi))
        .toDF("kept", "width", "geo_mean", "pseudoref", "lr_lo", "lr_hi", "ae_lo", "ae_hi")
        .repartition(1).write.parquet(new Path(path, "data").toString)
    }
  }

  private class Reader extends MLReader[TMMNormalizerModel] {
    private val className = classOf[TMMNormalizerModel].getName
    override def load(path: String): TMMNormalizerModel = {
      val metadata = DefaultParamsReader.loadMetadata(path, sparkSession, className)
      val row = sparkSession.read.parquet(new Path(path, "data").toString).head()
      val model = new TMMNormalizerModel(metadata.uid,
        row.getAs[Seq[Int]]("kept").toArray, row.getAs[Int]("width"),
        row.getAs[Double]("geo_mean"), row.getAs[Seq[Double]]("pseudoref").toArray,
        row.getAs[Double]("lr_lo"), row.getAs[Double]("lr_hi"),
        row.getAs[Double]("ae_lo"), row.getAs[Double]("ae_hi"))
      metadata.getAndSetParams(model)
      model
    }
  }

  override def read: MLReader[TMMNormalizerModel] = new Reader
  override def load(path: String): TMMNormalizerModel = super.load(path)
}
