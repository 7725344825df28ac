package graft

import org.apache.spark.sql.functions._
import graft.ml.Normalization

/** Golden-value tests for the normalization estimators, replaying the
  * reference's own verification approach (SURVEY §5.2): expected numbers
  * generated from the reference algorithm's semantics
  * (`functions/feature_selection_and_normalization.py`) on hand-sized
  * fixtures (FIXTURES.md §1 style: includes an all-zero gene for the
  * P2 mask path).
  */
class NormalizationSpec extends SparkSpec {
  import spark.implicits._

  // 3 samples × 4 genes; g2 (index 1) is all-zero → masked out by fit.
  private def uqFixture = Seq(
    (0L, Seq(2.0, 0.0, 8.0, 6.0)),
    (1L, Seq(4.0, 0.0, 4.0, 2.0)),
    (2L, Seq(1.0, 0.0, 3.0, 5.0))
  ).toDF("row_id", "features")

  test("UpperQuartile drops all-zero genes and matches reference golden factors") {
    val model = new Normalization.UpperQuartile(0.75, "features").fit(uqFixture)
    assert(model.kept == Seq(0, 2, 3))
    val rows = uqFixture.select($"row_id", model.normFactor.as("nf"), model.scalingFactor.as("sf"))
      .orderBy("row_id").collect()
    val expNorm = Seq(0.4375, 0.4, 0.4444444444444444)
    val expScale = Seq(1.0249268736250425, 0.937075998742896, 1.0411955541587734)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(approx(r.getDouble(1), expNorm(i), 1e-6), s"norm row $i: ${r.getDouble(1)}")
      assert(approx(r.getDouble(2), expScale(i), 1e-4), s"scale row $i: ${r.getDouble(2)}")
    }
  }

  test("UpperQuartile transform row-scales the masked matrix (golden)") {
    val model = new Normalization.UpperQuartile(0.75, "features").fit(uqFixture)
    val got = model.transform(uqFixture).orderBy("row_id")
      .select("features").as[Seq[Double]].collect()
    val exp = Seq(
      Seq(2.049853747250085, 8.19941498900034, 6.149561241750256),
      Seq(3.748303994971584, 3.748303994971584, 1.874151997485792),
      Seq(1.0411955541587734, 3.1235866624763204, 5.205977770793867))
    got.zip(exp).foreach { case (g, e) =>
      g.zip(e).foreach { case (a, b) => assert(approx(a, b, 1e-4), s"$a vs $b") }
    }
  }

  test("UpperQuartile scaling factors multiply to ~1 (reference symmetry property)") {
    val model = new Normalization.UpperQuartile(0.75, "features").fit(uqFixture)
    val lnSum = uqFixture.select(sum(log(model.scalingFactor))).head().getDouble(0)
    assert(math.abs(lnSum) < 1e-3)
  }

  test("TMM matches reference golden factors on a dense positive matrix") {
    val rows = Seq(
      Seq(2.4, 15.8, 9.3, 14.7, 19.6, 11.2, 10.5, 2.4),
      Seq(6.1, 10.5, 13.9, 16.3, 8.2, 2.3, 6.5, 18.3),
      Seq(5.1, 9.6, 18.7, 1.5, 12.4, 19.1, 5.4, 11.4),
      Seq(18.3, 3.5, 10.9, 15.3, 13.7, 9.9, 4.9, 10.3))
    val df = rows.zipWithIndex.map { case (r, i) => (i.toLong, r) }.toDF("row_id", "features")
    val model = new Normalization.TMM(0.3, 0.05, "features").fit(df)

    val expPref = Seq(0.28683385579937304, 0.30012690355329946, 0.28598484848484845,
      0.3253138075313808, 0.2815398886827458, 0.31, 0.27472527472527475, 0.30955188679245277)
    model.pseudoref.zip(expPref).foreach { case (a, b) => assert(approx(a, b, 1e-9), s"$a vs $b") }

    val scored = model.withFactors(df).orderBy("row_id")
      .select("norm_factor", "scaling_factor").collect()
    val gotNorm = scored.map(_.getDouble(0))
    val expNorm = Seq(0.5042932738261272, 0.5187328124729365, 0.4854365562005351, 0.4948714288707451)
    gotNorm.zip(expNorm).foreach { case (a, b) => assert(approx(a, b, 1e-6), s"$a vs $b") }

    val gotScale = scored.map(_.getDouble(1))
    val expScale = Seq(1.0072104823662984, 1.0360501584842352, 0.9695485014490869, 0.9883925018481547)
    gotScale.zip(expScale).foreach { case (a, b) => assert(approx(a, b, 1e-4), s"$a vs $b") }
  }

  test("native TrimmedMean matches the composed zip/filter/fold form bit-for-bit") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Seq[java.lang.Double](0.1, 0.5, null, Double.NaN, 0.9),
       Seq[java.lang.Double](1.0, 2.0, 3.0, 4.0, null)),
      (Seq[java.lang.Double](0.2, 0.3), Seq[java.lang.Double](5.0, 0.5)),
      (Seq[java.lang.Double](-9.0), Seq[java.lang.Double](1.0)) // nothing inside → null
    ).toDF("lr", "ae")
    val both = df.select(
      Normalization.trimmedMean(col("lr"), col("ae"), 0.0, 1.0, 0.0, 6.0).as("native"),
      Normalization.trimmedMeanComposed(col("lr"), col("ae"), 0.0, 1.0, 0.0, 6.0).as("composed"))
    both.collect().foreach { r =>
      val n = if (r.isNullAt(0)) null else r.getDouble(0)
      val c = if (r.isNullAt(1)) null else r.getDouble(1)
      assert(n == c, r.toString)
    }
  }
}
