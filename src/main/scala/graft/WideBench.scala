package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.io.WideIngest
import graft.matrix.ArrayOps
import graft.ml.Normalization

/** Full-reference-width proof: the BRCA matrix is 1205 × 60,483
  * (`brca_data_prep.ipynb` cell-14), and SURVEY §7.4.1 calls the one-time
  * wide-parquet → array-layout canonicalization the #1 design risk. This
  * main exercises that exact path at f = 60,483:
  *
  *   1. stage a synthetic WIDE parquet (one column per gene);
  *   2. canonicalize: read wide ONCE, collapse to `(sample_id, features)`,
  *      re-write canonical parquet + gene-name sidecar;
  *   3. UpperQuartile fit + transform + a row-quantile reduction over the
  *      canonical layout — constant-size plans from here on.
  *
  * Prints one JSON line per stage (secs + peak heap); numbers are recorded
  * in BASELINE.md. Not part of the driver's per-round bench protocol.
  * Env: SPARK_GRAFT_WIDE_N (rows, default 1205), SPARK_GRAFT_CPUS.
  */
object WideBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_WIDE_N", "1205").toInt
    val f = 60483
    val spark = graft.core.GraftSession.configure(
        SparkSession.builder().master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus)
          // the wide stages legitimately pin the driver (60k-attribute
          // analysis) — don't let heartbeats declare the executor dead
          .config("spark.executor.heartbeatInterval", "60s")
          .config("spark.network.timeout", "600s"),
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import scala.jdk.CollectionConverters._
    val heapPools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
    def timed[T](label: String)(body: => T): T = {
      heapPools.foreach(_.resetPeakUsage())
      val t0 = System.nanoTime()
      val r = body
      val dt = (System.nanoTime() - t0) / 1e9
      val peak = heapPools.map(_.getPeakUsage.getUsed).sum / 1024 / 1024
      println(f"""WIDE: {"stage":"$label","n":$n,"f":$f,"sec":$dt%.2f,"peak_heap_mib":$peak}""")
      r
    }

    val base = s"/root/repo/target/scratch/wide60k_$n"
    val widePath = s"$base/wide"
    val canonPath = s"$base/canonical"
    val namesPath = s"$base/genes"

    timed("stage_wide_parquet") {
      WideIngest.writeWideSynthetic(spark, widePath, n, f)
    }
    timed("canonicalize") {
      WideIngest.canonicalize(spark, widePath, "sample_id", canonPath, namesPath)
    }
    val (model, reduced) = timed("uq_fit_transform_reduce") {
      val df = graft.relational.Scale.fanOut(WideIngest.readCanonical(spark, canonPath))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val m = new Normalization.UpperQuartile(0.75, "features").fit(df)
      // materialize the normalized matrix BEFORE the downstream reduce:
      // interpreted HOFs get no CSE, so without this barrier projection
      // collapse would inline the whole ScaleRow expression into the
      // per-element reduce lambda — O(width²) per row, fatal at 60k
      val normalized = m.transform(df)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val red = normalized
        .select(ArrayOps.rowQuantile(ArrayOps.log2p1(col("features")), 0.5).as("q"))
        .agg(avg("q")).head().getDouble(0)
      df.unpersist(); normalized.unpersist()
      (m, red)
    }
    require(model.kept.size == f - (f + 96) / 97, s"mask wrong: ${model.kept.size}")
    require(!reduced.isNaN && reduced > 0, s"degenerate reduction: $reduced")
    println(s"""WIDE: {"stage":"done","kept":${model.kept.size},"reduced":$reduced}""")
    spark.stop()
  }
}
