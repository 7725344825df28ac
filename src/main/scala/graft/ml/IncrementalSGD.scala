package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** M15 — the reference's incremental-fit protocol
  * (`functions/dask_cv.py:10-19`: `estimator.fit(X, y, classes=...)` for
  * partial-fit estimators, i.e. dask-ml's `Incremental` wrapper streaming
  * blocks through sklearn's `SGDClassifier.partial_fit`).
  *
  * Spark-first re-expression: each `partialFit` call is ONE distributed
  * gradient step over the batch — a single `treeAggregate` computes the
  * full-batch hinge subgradient for every one-vs-rest class at once
  * (exactly MLlib's own gradient-descent shape), then the driver applies a
  * `lr/√t` step with L2 on the weights. The class list is declared up
  * front, so a batch that lacks a class still updates every binary
  * problem — the precise reason the reference's protocol has `classes=`.
  *
  * Scale notes: state is O(classes × dim) on the driver (KBs); each step
  * is one map-side-combined pass over the batch — no shuffle, no
  * per-row driver traffic. The one RDD use is the gradient aggregate,
  * the sanctioned per-partition imperative case (MLlib does the same).
  */
class IncrementalSGD(val classes: Seq[Double], val dim: Int,
                     lr: Double = 1.0, reg: Double = 1e-4) extends Serializable {
  require(classes.nonEmpty && classes == classes.distinct, "classes must be distinct")

  /** One weight vector per class, bias in slot `dim`. Zero-initialized:
    * sklearn's `partial_fit` starts from zeros too, keeping runs
    * reproducible without a seeded init. */
  private[graft] val weights: Array[Array[Double]] =
    Array.fill(classes.size)(new Array[Double](dim + 1))
  private var step = 0

  /** Number of partial-fit steps applied so far. */
  def steps: Int = step

  /** One distributed mini-batch gradient step. `featuresCol` is an
    * Array[Double] column of width `dim`; `labelCol` must hold values from
    * `classes` (others train as all-negative rows, like sklearn). */
  def partialFit(batch: DataFrame, labelCol: String, featuresCol: String): this.type = {
    val data = batch.select(col(labelCol).cast("double"), col(featuresCol))
      .rdd.map(r => (r.getDouble(0), r.getSeq[Double](1).toArray))
    fitStep(data)
  }

  /** [[partialFit]] over a pre-extracted (label, features) RDD — lets
    * callers cache batches once and re-feed them across epochs. */
  def fitStep(data: org.apache.spark.rdd.RDD[(Double, Array[Double])]): this.type = {
    val sc = data.sparkContext
    val bw = sc.broadcast(weights.map(_.clone()))
    val cls = classes.toArray
    val d = dim
    val zero = (Array.fill(cls.length)(new Array[Double](d + 1)), 0L)
    val (gradSum, n) = data.treeAggregate(zero)(
      seqOp = { case ((g, cnt), (label, x)) =>
        require(x.length == d, s"feature width ${x.length} != $d")
        var k = 0
        while (k < cls.length) {
          val w = bw.value(k)
          val y = if (label == cls(k)) 1.0 else -1.0
          var m = w(d)
          var i = 0
          while (i < d) { m += w(i) * x(i); i += 1 }
          if (y * m < 1.0) { // hinge subgradient: active when margin < 1
            val gk = g(k)
            i = 0
            while (i < d) { gk(i) -= y * x(i); i += 1 }
            gk(d) -= y
          }
          k += 1
        }
        (g, cnt + 1)
      },
      combOp = { case ((g1, n1), (g2, n2)) =>
        var k = 0
        while (k < g1.length) {
          val a = g1(k); val b = g2(k)
          var i = 0
          while (i <= d) { a(i) += b(i); i += 1 }
          k += 1
        }
        (g1, n1 + n2)
      })
    bw.destroy()
    require(n > 0, "partialFit on an empty batch")
    step += 1
    val eta = lr / math.sqrt(step.toDouble)
    var k = 0
    while (k < weights.length) {
      val w = weights(k); val g = gradSum(k)
      var i = 0
      while (i <= d) {
        // bias (slot d) is unregularized, as in sklearn's SGD
        val l2 = if (i < d) reg * w(i) else 0.0
        w(i) -= eta * (g(i) / n + l2)
        i += 1
      }
      k += 1
    }
    this
  }

  /** Per-class decision margins as literal-array expressions — the scoring
    * path stays in codegen'd Columns (no UDF): margin_k = b_k + w_k·x. */
  private def marginCols(featuresCol: Column): Seq[Column] =
    weights.map { w =>
      val wLit = array(w.take(dim).map(lit).toSeq: _*)
      lit(w(dim)) + aggregate(
        zip_with(featuresCol, wLit, (x, wi) => x * wi), lit(0.0), _ + _)
    }.toSeq

  /** Append `predictionCol` = argmax-margin class (first class wins ties,
    * matching sklearn's argmax over the decision matrix). */
  def transform(df: DataFrame, featuresCol: String,
                predictionCol: String = "prediction"): DataFrame = {
    val margins = array(marginCols(col(featuresCol)): _*)
    val clsLit = array(classes.map(lit): _*)
    df.withColumn(predictionCol,
      element_at(clsLit, array_position(margins, array_max(margins)).cast("int")))
  }
}
