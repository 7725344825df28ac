package graft

import org.apache.spark.sql.functions._
import graft.ml.GexpPipeline

/** t1-style smoke for the flagship end-to-end slice (SURVEY §7.5 step 4)
  * on sf0.001: the whole reference workload must run and produce sane,
  * seed-stable results.
  */
class GexpPipelineSpec extends SparkSpec {

  private def gexp = graft.io.Tables.embeddings(spark, sf("sf0.001")).select(
    col("vec_id"),
    transform(col("embedding"), x => exp(x.cast("double")) * 10.0).as("features"),
    concat(lit("class_"), (col("label") % 3).cast("string")).as("subtype"))

  test("end-to-end gexp pipeline runs and is deterministic") {
    val r1 = GexpPipeline.run(gexp, "vec_id", "features", "subtype")
    assert(r1.nTrain + r1.nTest == 500)
    assert(math.abs(r1.nTrain / 500.0 - 0.7) < 0.05)
    assert(r1.nFeaturesKept > 0 && r1.nFeaturesKept <= 64)
    assert(r1.accuracy >= 0.0 && r1.accuracy <= 1.0)
    assert(r1.cvMean >= 0.0 && r1.cvMean <= 1.0 && r1.cvVar >= 0.0)
    val r2 = GexpPipeline.run(gexp, "vec_id", "features", "subtype")
    assert(r1 == r2) // seed-pinned end to end (reference §5.3)
  }

  test("positionStats matches per-column agg semantics") {
    import spark.implicits._
    val df = Seq(
      Tuple1(Seq(1.0, 10.0)), Tuple1(Seq(2.0, 20.0)), Tuple1(Seq(3.0, 30.0))
    ).toDF("features")
    val (means, vars) = GexpPipeline.positionStats(df, "features")
    assert(means.toSeq == Seq(2.0, 20.0))
    assert(approx(vars(0), 1.0, 1e-12) && approx(vars(1), 100.0, 1e-12))
  }
}
