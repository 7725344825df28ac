package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.relational.Intervals

/** Interval-join scaling proof: the driver events table yields ~10k
  * sessions — too small to separate a banded join from a cartesian — so
  * this main sweeps synthetic sessions × incidents with BOTH sides
  * growing (incidents = n/10): the regime where the naive cross join is
  * O(n²/10) while the banded equi-join stays ~linear in n + matches.
  *
  * Deterministic synthetic: n sessions of 10–50 min spread over 30 days
  * (density grows with n, like real traffic), incidents of ±30 min around
  * a hashed offset. The naive plan is also timed up to
  * SPARK_GRAFT_NAIVE_CAP (default 80k — 640M comparisons; the 320k cell
  * would be 10G) and its match count cross-checks the banded result.
  * One JSON line per cell; recorded in BASELINE.md. Not part of the
  * per-round driver protocol. Env: SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_INTERVAL_NS (comma list), SPARK_GRAFT_NAIVE_CAP.
  */
object IntervalScaleBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val ns = sys.env.getOrElse("SPARK_GRAFT_INTERVAL_NS", "20000,80000,320000")
      .split(",").map(_.trim.toInt).toSeq
    val naiveCap = sys.env.getOrElse("SPARK_GRAFT_NAIVE_CAP", "80000").toInt
    val spark = graft.core.GraftSession.configure(
        SparkSession.builder().master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus),
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val baseMicros = 1704067200000000L // 2024-01-01T00:00Z
    val monthMin = 30L * 24 * 60

    for (n <- ns) {
      val sessions = spark.range(n.toLong).select(
          col("id").as("sess_id"),
          timestamp_micros(lit(baseMicros) +
            pmod(col("id") * 7919, lit(monthMin)) * 60000000L).as("s_start"),
          timestamp_micros(lit(baseMicros) +
            (pmod(col("id") * 7919, lit(monthMin)) + 10 + pmod(col("id"), lit(41))) * 60000000L)
            .as("s_end"))
        .repartition(cpus.toInt)
      val incidents = spark.range((n / 10).toLong).select(
          col("id").as("inc_id"),
          timestamp_micros(lit(baseMicros) +
            (pmod(col("id") * 104729, lit(monthMin)) - 30) * 60000000L).as("i_start"),
          timestamp_micros(lit(baseMicros) +
            (pmod(col("id") * 104729, lit(monthMin)) + 30) * 60000000L).as("i_end"))
        .repartition(cpus.toInt)

      val t0 = System.nanoTime()
      val banded = Intervals.overlapJoin(sessions, "s_start", "s_end",
          incidents, "i_start", "i_end")
        .select("sess_id", "inc_id")
      val nMatches = banded.count()
      val tBanded = (System.nanoTime() - t0) / 1e9

      val (tNaive, naiveMatches) =
        if (n <= naiveCap) {
          val t1 = System.nanoTime()
          val m = sessions.crossJoin(incidents)
            .filter(col("s_start") <= col("i_end") && col("i_start") <= col("s_end"))
            .select("sess_id", "inc_id").distinct().count()
          ((System.nanoTime() - t1) / 1e9, m)
        } else (-1.0, -1L)
      require(naiveMatches < 0 || naiveMatches == nMatches,
        s"banded join diverged from naive at n=$n: $nMatches vs $naiveMatches")

      println(s"""{"bench":"interval_scale","n":$n,"incidents":${n / 10},""" +
        s""""matches":$nMatches,"banded_sec":${f"$tBanded%.2f"},""" +
        s""""naive_sec":${f"$tNaive%.2f"}}""")
    }
    spark.stop()
  }
}
