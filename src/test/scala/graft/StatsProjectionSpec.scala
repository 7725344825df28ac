package graft

import graft.relational.StatsProjection

class StatsProjectionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1.0, 0.0, 10.0, -5.0),
    (2.0, 0.0, 20.0, 5.0),
    (3.0, 0.0, 60.0, 0.0)
  ).toDF("a", "zero", "big", "mixed")

  test("projectByMean keeps only columns with global mean > threshold") {
    val kept = StatsProjection.projectByMean(df, Seq("a", "zero", "big", "mixed"), 0.0)
    assert(kept.columns.toSeq == Seq("a", "big")) // mean(mixed)=0 → dropped (strict >)
  }

  test("quantile-threshold projection keeps cols above both q25 thresholds") {
    val kept = StatsProjection.projectByQuantileThreshold(df, Seq("a", "zero", "big", "mixed"), 0.25)
    // means: a=2, zero=0, big=30, mixed=0 ; vars: a=1, zero=0, big=700, mixed=25
    // q25(means)=.5, q25(vars)=.75 → a and big pass both; mixed fails mean
    assert(kept.columns.toSeq == Seq("a", "big"))
  }

  test("mask is global, not per-partition (reference bug not reproduced)") {
    val skewed = df.repartition(3) // any partitioning must give same answer
    val kept = StatsProjection.projectByMean(skewed, Seq("a", "zero", "big", "mixed"), 0.0)
    assert(kept.columns.toSeq == Seq("a", "big"))
  }

  test("quantileType7 matches numpy linear interpolation") {
    assert(StatsProjection.quantileType7(Seq(1.0, 2.0, 3.0, 4.0), 0.75) == 3.25)
    assert(StatsProjection.quantileType7(Seq(5.0), 0.5) == 5.0)
    assert(StatsProjection.quantileType7(Seq(1.0, 2.0), 0.25) == 1.25)
  }
}
