package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — BASELINE.md protocol: min-of-3 wall time per query
  * (repeats capped once a query has spent 30s total, so heavy ML/fit
  * queries run once), peak heap high-water mark, single local JVM.
  * Emits ONE JSON line for the driver.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt
    val spark = graft.core.GraftSession.configure(
        SparkSession.builder()
          .master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus),
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val memBean = java.lang.management.ManagementFactory.getMemoryMXBean
    var peakMem = 0L
    def sampleMem(): Unit = {
      val used = memBean.getHeapMemoryUsage.getUsed
      if (used > peakMem) peakMem = used
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      var best = Double.MaxValue
      var spent = 0.0
      var runs = 0
      while (runs < repeats && (runs == 0 || spent < 30.0)) {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
        val dt = (System.nanoTime() - t0) / 1e9
        spent += dt; runs += 1
        if (dt < best) best = dt
        sampleMem()
      }
      name -> best
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val memMib = peakMem / 1024 / 1024
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","peak_heap_mib":$memMib,"protocol":"min-of-$repeats, repeats capped at 30s/query"}""")
    spark.stop()
  }
}
