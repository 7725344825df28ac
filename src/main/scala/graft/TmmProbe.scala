package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.matrix.ArrayOps

/** Scratch profiler for q28's phases — not part of the driver protocol. */
object TmmProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32, "tmm-probe")
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li0 = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        ArrayOps.toArray(Seq(col("l_quantity"), col("l_extendedprice"),
          lit(1.0) + col("l_discount"), lit(1.0) + col("l_tax"))).as("features"))
    val li = sys.env.getOrElse("PROBE_FAN", "0").toInt match {
      case 0 => li0
      case n => li0.repartition(n)
    }

    timed("warm_scan")(li.agg(count(lit(1))).head())

    // phase 1: colStats narrow path (4 approx_percentile + decimal sums)
    val pctl = (c: String, q: Double) => expr(s"approx_percentile($c, $q, ${sys.env.getOrElse("PROBE_ACC", "50000")})")
    timed("colstats") {
      val aggs = (0 until 4).flatMap { i =>
        val xi = s"element_at(features, ${i + 1})"
        Seq(expr(s"sum(CASE WHEN $xi != 0.0 THEN 1 ELSE 0 END)"),
          pctl(s"CASE WHEN $xi > 0 THEN $xi END", 0.75),
          expr(s"CAST(sum(CAST($xi AS DECIMAL(38,6))) AS DOUBLE)"))
      }
      li.agg(aggs.head, aggs.tail: _*).head()
    }

    // phase 2: ratio matrix build + persist
    val pseudoref = Array(0.1, 0.2, 0.3, 0.4)
    val mat = timed("mat_build") {
      val m = graft.ml.Normalization.withRatioArrays(li, col("features"), pseudoref)
        .drop("features")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      m.count(); m
    }

    // phase 3: global quantile scan (zipped explode + 4 GK sketches)
    def masked_(c: String) = s"CASE WHEN $c IS NOT NULL AND NOT isnan($c) THEN $c END"
    timed("trim_quantiles_zipwith") {
      val z = mat.select(explode(zip_with(col("__r.lr"), col("__r.ae"),
          (l, a) => struct(l.as("l"), a.as("a")))).as("z"))
        .select(col("z.l").as("l"), col("z.a").as("a"))
      z.agg(pctl(masked_("l"), 0.3), pctl(masked_("l"), 0.7),
        pctl(masked_("a"), 0.05), pctl(masked_("a"), 0.95)).head()
    }
    timed("trim_quantiles_arrayszip") {
      val z = mat.select(explode(arrays_zip(col("__r.lr").as("l"), col("__r.ae").as("a"))).as("z"))
        .select(col("z.l").as("l"), col("z.a").as("a"))
      z.agg(pctl(masked_("l"), 0.3), pctl(masked_("l"), 0.7),
        pctl(masked_("a"), 0.05), pctl(masked_("a"), 0.95)).head()
    }
    timed("trim_quantiles_coalesce4") {
      val z = mat.coalesce(4).select(explode(zip_with(col("__r.lr"), col("__r.ae"),
          (l, a) => struct(l.as("l"), a.as("a")))).as("z"))
        .select(col("z.l").as("l"), col("z.a").as("a"))
      z.agg(pctl(masked_("l"), 0.3), pctl(masked_("l"), 0.7),
        pctl(masked_("a"), 0.05), pctl(masked_("a"), 0.95)).head()
    }
    timed("trim_quantiles_coalesce8") {
      val z = mat.coalesce(8).select(explode(zip_with(col("__r.lr"), col("__r.ae"),
          (l, a) => struct(l.as("l"), a.as("a")))).as("z"))
        .select(col("z.l").as("l"), col("z.a").as("a"))
      z.agg(pctl(masked_("l"), 0.3), pctl(masked_("l"), 0.7),
        pctl(masked_("a"), 0.05), pctl(masked_("a"), 0.95)).head()
    }

    // phase 4: factor cache + gm
    val factor = graft.ml.Normalization.trimmedMean(col("__r.lr"), col("__r.ae"), -1.0, 1.0, 0.0, 2.0)
    val scored = timed("factor_cache") {
      val sc0 = mat.withColumn("norm_factor", factor).drop("__r")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      sc0.select((graft.util.Parity.dsum6(log(when(col("norm_factor") === 0.0, 1.0)
        .otherwise(col("norm_factor")))) / count(lit(1)))).head()
      sc0
    }

    // phase 5: dump write
    timed("dump_write") {
      scored.withColumn("scaling_factor", col("norm_factor") / 2.0)
        .select("l_orderkey", "l_linenumber", "scaling_factor")
        .write.mode("overwrite").parquet("/tmp/tmm_probe_dump")
    }
    spark.stop()
  }
}
