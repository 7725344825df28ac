package graft

import org.apache.spark.sql.functions._
import graft.ml.DeterministicSplits

class SplitsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val keys = (1L to 10000L).toDF("k")

  test("train/test split is disjoint, exhaustive, ~70/30, and repartition-stable") {
    val train = DeterministicSplits.trainSplit(keys, $"k", 0.7)
    val test = DeterministicSplits.testSplit(keys, $"k", 0.7)
    val nTrain = train.count(); val nTest = test.count()
    assert(nTrain + nTest == 10000)
    assert(math.abs(nTrain / 10000.0 - 0.7) < 0.02)
    assert(train.intersect(test).count() == 0)
    // pure key function ⇒ identical membership under any partitioning
    val re = DeterministicSplits.trainSplit(keys.repartition(13), $"k", 0.7)
    assert(re.exceptAll(train).count() == 0 && train.exceptAll(re).count() == 0)
  }

  test("fold ids are in [0,k), disjoint-exhaustive, roughly balanced") {
    val withFold = keys.withColumn("f", DeterministicSplits.foldId($"k", 10))
    val counts = withFold.groupBy("f").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet == (0L until 10L).toSet)
    assert(counts.values.sum == 10000)
    counts.values.foreach(c => assert(math.abs(c - 1000.0) < 150, s"unbalanced: $counts"))
  }

  test("stratified sample respects per-stratum fractions") {
    val df = keys.withColumn("g", when($"k" % 2 === 0, "even").otherwise("odd"))
    val sampled = DeterministicSplits.stratifiedSample(
      df, $"k", $"g", Map("even" -> 0.5, "odd" -> 0.1))
    val by = sampled.groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(by("even") / 5000.0 - 0.5) < 0.05)
    assert(math.abs(by("odd") / 5000.0 - 0.1) < 0.03)
  }
}
