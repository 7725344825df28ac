package graft

import org.apache.spark.sql.functions._
import graft.ml.IncrementalSGD

class IncrementalSGDSpec extends SparkSpec {
  import spark.implicits._

  private def toDf(rows: Seq[(Double, Seq[Double])]) =
    rows.toDF("label", "features")

  test("separable binary problem converges through sequential partial fits") {
    // two clusters on the x-axis, batches fed one after the other
    val batch1 = toDf(Seq((0.0, Seq(-2.0, 0.5)), (0.0, Seq(-1.5, -0.5)),
                          (1.0, Seq(2.0, 0.3)), (1.0, Seq(1.7, -0.2))))
    val batch2 = toDf(Seq((0.0, Seq(-1.8, 0.1)), (1.0, Seq(2.2, 0.4))))
    val m = new IncrementalSGD(Seq(0.0, 1.0), dim = 2)
    (1 to 10).foreach { _ =>
      m.partialFit(batch1, "label", "features")
      m.partialFit(batch2, "label", "features")
    }
    val all = batch1.union(batch2)
    val acc = m.transform(all, "features")
      .filter(col("prediction") === col("label")).count().toDouble / all.count()
    assert(acc == 1.0, s"separable data must be fully learned, got $acc")
  }

  test("classes declared up front survive a batch missing a class (M15 protocol)") {
    val full = toDf(Seq((0.0, Seq(-2.0, 0.0)), (1.0, Seq(2.0, 0.0)), (2.0, Seq(0.0, 2.0))))
    val partial = toDf(Seq((0.0, Seq(-2.1, 0.1)), (1.0, Seq(1.9, -0.1)))) // no class 2
    val m = new IncrementalSGD(Seq(0.0, 1.0, 2.0), dim = 2)
    (1 to 15).foreach { _ =>
      m.partialFit(full, "label", "features")
      m.partialFit(partial, "label", "features") // must not shrink the class space
    }
    assert(m.weights.length == 3)
    val preds = m.transform(full, "features").select("label", "prediction")
      .as[(Double, Double)].collect().toMap
    assert(preds(2.0) == 2.0, s"class 2 must remain predictable: $preds")
    assert(preds(0.0) == 0.0 && preds(1.0) == 1.0)
  }

  test("two identical runs produce identical weights (zero-init determinism)") {
    val df = toDf(Seq((0.0, Seq(-1.0, 1.0)), (1.0, Seq(1.0, -1.0)), (1.0, Seq(0.5, 0.2))))
      .repartition(1) // fixed partitioning → identical float-sum order
    def run() = {
      val m = new IncrementalSGD(Seq(0.0, 1.0), dim = 2)
      (1 to 5).foreach(_ => m.partialFit(df, "label", "features"))
      m.weights.map(_.toSeq).toSeq
    }
    assert(run() == run())
  }

  test("empty batch is rejected") {
    val m = new IncrementalSGD(Seq(0.0, 1.0), dim = 2)
    intercept[IllegalArgumentException] {
      m.partialFit(toDf(Seq.empty), "label", "features")
    }
  }
}
