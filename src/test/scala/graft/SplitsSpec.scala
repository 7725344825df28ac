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

  test("nestedRandomSearch: deterministic draws, disjoint inner folds, first-max tie-break") {
    import graft.ml.Models
    val df = keys.limit(200).toDF("vec_id")
    val grid = Map("a" -> Seq(0.0, 0.1, 0.2), "b" -> Seq(1, 2))
    // fake fit/score: deterministic in (config, test-set size) — exercises
    // the sampling / fold / argmax plumbing without MLlib fits
    // score = f(test-set size) only → identical for every config within a
    // fold, so the argmax must fall to the tie-break
    def run() = Models.nestedRandomSearch(df, 3, 2, "vec_id", grid, nIter = 8) {
      _ => _ => te => te
    } { te => 1.0 / (1.0 + te.count().toDouble) }
    val (trials1, bests1) = run()
    val (trials2, bests2) = run()
    assert(trials1.map(t => (t._1, t._2, t._3)) == trials2.map(t => (t._1, t._2, t._3)),
      "config draw must be seed-deterministic")
    assert(bests1.map(_._1) == Seq(0, 1, 2))
    // every fold scored every distinct config exactly once
    val perFold = trials1.groupBy(_._1).values.map(_.map(_._2).sorted.toList).toSet
    assert(perFold.size == 1 && perFold.head == trials1.map(_._2).distinct.sorted.toList)
    // all-equal scores → argmax falls to the lowest trial id per fold
    assert(bests1 == bests2)
    bests1.foreach(b => assert(b._2 == trials1.filter(_._1 == b._1).map(_._2).min))
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
