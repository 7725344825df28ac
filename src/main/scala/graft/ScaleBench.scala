package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.matrix.ArrayOps
import graft.ml.{GexpPipeline, Normalization}

/** Scaling-curve mini-bench replaying the reference's samplewise /
  * featurewise protocol (`singlemachine_dataset_samplewise_benchmark.py:21-33`,
  * `singlemachine_dataset_featurewise_benchmark.py:20-34`): n ∈ {200, 600,
  * 1205} samples × f ∈ {10k, 20k, 40k} features, timing the matrix-pipeline
  * core (UQ fit+transform → exact per-position stats → q25 mean/var mask →
  * log2(x+1) → row-quantile reduce) with a peak-heap sample per cell.
  *
  * The matrix is the deterministic LCG synthetic from WideMatrixSpec
  * (positive FPKM-like values, every 97th gene all-zero). One JSON line per
  * cell; results are recorded in BASELINE.md. Not part of the driver's
  * per-round bench protocol.
  */
object ScaleBench {

  private def wide(spark: SparkSession, rows: Int, width: Int) =
    spark.range(rows.toLong).select(
      col("id").as("row_id"),
      transform(sequence(lit(0), lit(width - 1)), c => {
        val h = pmod((col("id") * width + c) * 1103515245L + 12345L, lit(2147483647L))
        when(pmod(c, lit(97)) === 0, 0.0)
          .otherwise(h.cast("double") / 2147483647.0 * 100.0)
      }).as("features"))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.configure(
        SparkSession.builder().master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus),
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val memBean = java.lang.management.ManagementFactory.getMemoryMXBean

    for (n <- Seq(200, 600, 1205); f <- Seq(10000, 20000, 40000)) {
      @volatile var peak = 0L
      @volatile var run = true
      val sampler = new Thread(() => {
        while (run) {
          peak = math.max(peak, memBean.getHeapMemoryUsage.getUsed)
          Thread.sleep(50)
        }
      })
      sampler.setDaemon(true)
      sampler.start()
      val t0 = System.nanoTime()

      val df = wide(spark, n, f)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val uq = new Normalization.UpperQuartile(0.75, "features").fit(df)
      // materialize the normalized matrix: downstream per-element lambdas
      // (the mask) must read a stored column, not re-derive the scaled
      // array through projection collapse
      val normalized = uq.transform(df)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (means, vars) = GexpPipeline.positionStatsExact(normalized, "features")
      val tm = graft.relational.StatsProjection.quantileType7(means.toSeq, 0.25)
      val tv = graft.relational.StatsProjection.quantileType7(vars.toSeq, 0.25)
      val kept = means.indices.filter(i => means(i) > tm && vars(i) > tv)
      val masked = Normalization.maskPositions(col("features"), kept, f)
      val reduced = normalized
        .select(ArrayOps.rowQuantile(ArrayOps.log2p1(masked), 0.5).as("m"))
        .agg(avg("m")).head().getDouble(0)
      require(!reduced.isNaN && reduced > 0, s"degenerate cell n=$n f=$f")
      normalized.unpersist()
      df.unpersist()

      val dt = (System.nanoTime() - t0) / 1e9
      run = false
      println(f"""SCALE: {"n":$n,"f":$f,"kept":${kept.size},"sec":$dt%.2f,"peak_heap_mib":${peak / 1024 / 1024}}""")
    }
    spark.stop()
  }
}
