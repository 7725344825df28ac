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

  test("dcorr matches built-in corr to float tolerance and is partition-stable") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val data = Seq.fill(2000)((rnd.nextDouble() * 100, rnd.nextDouble() * 50))
      .map { case (x, y) => (x, 0.3 * x + y) }
    val df2 = data.toDF("x", "y")
    val exact = df2.agg(graft.util.Parity.dcorr(col("x"), col("y"))).head().getDouble(0)
    val builtin = df2.stat.corr("x", "y")
    assert(math.abs(exact - builtin) < 1e-6, s"$exact vs $builtin")
    // decimal moments are order-independent: any repartitioning, same bits
    val repart = df2.repartition(7).agg(graft.util.Parity.dcorr(col("x"), col("y"))).head().getDouble(0)
    assert(exact == repart)
  }

  test("quantileBin partitions all rows into ordered, populated quartiles") {
    import org.apache.spark.sql.functions._
    val df2 = (1 to 1001).map(i => i * 1.5).toDF("v")
    val binned = graft.ml.PipelineStages.quantileBin(df2, "v", "bucket")
    val stats = binned.groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("v").as("lo"), max("v").as("hi"))
      .orderBy("bucket").collect()
    assert(stats.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(stats.map(_.getLong(1)).sum == 1001)
    stats.sliding(2).foreach { w =>
      if (w.size == 2) assert(w(0).getDouble(3) <= w(1).getDouble(2)) // ordered ranges
    }
    val sizes = stats.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 2, sizes.mkString(",")) // quartiles balanced
  }
}
