package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev scratchpad main — ad-hoc probes during development; not part of the
  * engine surface and free of engine logic.
  *
  * Current probe: wide-matrix (60,483-col) canonicalization layout sweep —
  * read parallelism is bounded by row groups per file × files, so compare
  * the 8-slice staging (8 files × 2 groups) against a 32-slice staging
  * (32 files × 1 group) and split-size overrides on both.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val base = "/root/repo/target/scratch/wide60k_1205"
    val wide8 = s"$base/wide"            // existing 8-slice staging
    val wide32 = s"$base/wide32"         // new 32-slice staging
    def canon(src: String, tag: String, maxPart: Option[String]): Unit = {
      val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
      maxPart.foreach(v => spark.conf.set("spark.sql.files.maxPartitionBytes", v))
      try t(s"canonicalize[$tag]") {
        graft.io.WideIngest.canonicalize(spark, src, "sample_id",
          s"$base/canon_$tag", s"$base/genes_$tag")
      } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    }
    canon(wide8, "8file_default", None)
    canon(wide8, "8file_32m", Some("33554432"))
    t("stage32")(graft.io.WideIngest.writeWideSynthetic(spark, wide32, 1205, 60483, slices = 32))
    canon(wide32, "32file_default", None)
    spark.stop()
  }
}
