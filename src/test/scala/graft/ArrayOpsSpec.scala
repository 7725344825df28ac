package graft

import org.apache.spark.sql.functions._
import graft.matrix.ArrayOps

class ArrayOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one(arr: Seq[Double]) = Seq(Tuple1(arr)).toDF("a")

  test("rowQuantile matches numpy type-7 interpolation") {
    // np.quantile([1,2,3,4], .75) = 3.25 ; ([5], any q) = 5 ; median of evens
    val df = one(Seq(4.0, 1.0, 3.0, 2.0)).select(
      ArrayOps.rowQuantile($"a", 0.75).as("q75"),
      ArrayOps.rowQuantile($"a", 0.5).as("med"),
      ArrayOps.rowQuantile($"a", 0.0).as("mn"),
      ArrayOps.rowQuantile($"a", 1.0).as("mx"))
    val r = df.head()
    assert(r.getDouble(0) == 3.25 && r.getDouble(1) == 2.5 &&
           r.getDouble(2) == 1.0 && r.getDouble(3) == 4.0)
    assert(one(Seq(5.0)).select(ArrayOps.rowQuantile($"a", 0.3)).head().getDouble(0) == 5.0)
  }

  test("rowSumExact is exact and order-independent; rowSum is sequential") {
    val r = one(Seq(0.1, 0.2, 0.3)).select(
      ArrayOps.rowSumExact($"a"), ArrayOps.rowSum($"a")).head()
    assert(r.getDouble(0) == 0.6) // decimal-exact: no 0.6000000000000001
    assert(approx(r.getDouble(1), 0.6, 1e-12))
  }

  test("elementwise ops: log2p1, scaleRow, positives, replaceValue, dot, cosine") {
    val r = one(Seq(1.0, 3.0, -2.0, 0.0)).select(
      ArrayOps.log2p1(array(lit(1.0), lit(3.0))).as("l"),
      ArrayOps.scaleRow($"a", lit(2.0)).as("s"),
      ArrayOps.positives($"a").as("p"),
      ArrayOps.replaceValue($"a", 0.0, 1.0).as("r"))
    val row = r.head()
    assert(row.getSeq[Double](0) == Seq(1.0, 2.0))
    assert(row.getSeq[Double](1) == Seq(2.0, 6.0, -4.0, 0.0))
    assert(row.getSeq[Double](2) == Seq(1.0, 3.0))
    assert(row.getSeq[Double](3) == Seq(1.0, 3.0, -2.0, 1.0))

    val d = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("x", "y")
      .select(ArrayOps.dot($"x", $"y").as("dot"), ArrayOps.cosine($"x", $"x").as("cos"))
      .head()
    assert(d.getDouble(0) == 32.0)
    assert(approx(d.getDouble(1), 1.0, 1e-12))
  }

  test("native ScaleRow matches the composed lambda form (incl. null factor)") {
    val df = Seq(
      (Seq(1.0, -2.5, 0.0), Some(2.0)),
      (Seq(3.0), None),
      (Seq.empty[Double], Some(1.5))
    ).toDF("arr", "f")
    val both = df.select(
      ArrayOps.scaleRow($"arr", $"f").as("native"),
      ArrayOps.scaleRowComposed($"arr", $"f").as("composed"))
    both.collect().foreach { r =>
      assert(r.getSeq[Any](0) == r.getSeq[Any](1), r.toString)
    }
  }
}
