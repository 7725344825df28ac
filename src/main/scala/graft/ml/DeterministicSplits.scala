package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.Parity

/** Seeded data-splitting semantics (SURVEY §2.9 M3/M4/M7, §7.2.5).
  *
  * The reference pins `random_state=42` on every stochastic op
  * (`functions/dask_pipeline.py:57-58`, `data/brca_undersample.py:31-33`,
  * `functions/dask_cv.py:56`). Bitwise parity with sklearn's Mersenne
  * twister is explicitly out of scope; parity is at the *semantics* level
  * (fractions, stratification, disjoint folds — SURVEY §7.2.5). The engine
  * therefore uses a **key-hash partitioner**: membership is a pure function
  * of the row key, so splits are reproducible across engines, runs, cluster
  * sizes and repartitioning — a stronger reproducibility guarantee than
  * `randomSplit`'s per-partition Bernoulli draw, and shuffle-free.
  */
object DeterministicSplits {

  /** Uniform [0, 1) deterministic pseudo-position of a key. */
  def unitHash(key: Column): Column =
    Parity.keyHash(key).cast("double") / lit(Parity.HashMod.toDouble)

  /** M3 — 70/30-style train/test tag (`train_test_split(test_size=0.3)`,
    * `functions/dask_pipeline.py:57-58`). */
  def splitTag(key: Column, trainFraction: Double): Column =
    when(unitHash(key) < lit(trainFraction), "train").otherwise("test")

  def trainSplit(df: DataFrame, key: Column, frac: Double): DataFrame =
    df.filter(unitHash(key) < lit(frac))
  def testSplit(df: DataFrame, key: Column, frac: Double): DataFrame =
    df.filter(unitHash(key) >= lit(frac))

  /** M4 — stratified sampling: per-stratum fraction map
    * (`train_test_split(…, stratify=labels)`, `data/brca_undersample.py:31-33`;
    * Spark-native analog of `df.stat.sampleBy`). */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
                       fractions: Map[String, Double]): DataFrame = {
    val frac = fractions.foldLeft(lit(0.0)) { case (acc, (k, f)) =>
      when(stratum === lit(k), lit(f)).otherwise(acc)
    }
    df.filter(unitHash(key) < frac)
  }

  /** M7 — disjoint, exhaustive K-fold assignment
    * (`KFold(10, shuffle=True, random_state=42)`, `functions/dask_cv.py:56`). */
  def foldId(key: Column, k: Int): Column =
    pmod(Parity.keyHash(key), lit(k.toLong)).cast("long")
}
