package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev scratchpad main — ad-hoc probes during development; not part of the
  * engine surface and free of engine logic. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import graft.matrix.ArrayOps
    val li = graft.io.Tables.lineitem(spark, d).withColumn("features",
      ArrayOps.toArray(Seq(col("l_quantity"), col("l_extendedprice"),
        lit(1.0) + col("l_discount"), lit(1.0) + col("l_tax"))))
    t("warm-scan")(li.write.format("noop").mode("overwrite").save())
    // stage-by-stage TMM replay (mirrors Normalization.fitInternal)
    val pos = li.select(posexplode(col("features")).as(Seq("pos", "x")))
    val cs = t("colstats-explode")(pos.groupBy("pos").agg(
      sum(when(col("x") =!= 0.0, 1).otherwise(0)).as("nnz"),
      expr("approx_percentile(CASE WHEN x > 0 THEN x END, 0.75, 50000)").as("q75pos"),
      sum(col("x").cast(org.apache.spark.sql.types.DecimalType(38, 6))).cast("double").as("colsum"))
      .collect())
    val kept = cs.sortBy(_.getInt(0)).map(r => r.getDouble(2) / r.getDouble(3))
    val mat = graft.ml.Normalization.withRatioArrays(li, col("features"), kept)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("mat-persist")(mat.count())
    val exploded = mat
      .select(explode(col("__r.lr")).as("v"), lit("lr").as("w"))
      .unionAll(mat.select(explode(col("__r.ae")).as("v"), lit("ae").as("w")))
      .filter(col("v").isNotNull && !isnan(col("v")))
    t("trims")(exploded.groupBy("w").agg(
      expr("approx_percentile(v, 0.3, 50000)"), expr("approx_percentile(v, 0.7, 50000)"),
      expr("approx_percentile(v, 0.05, 50000)"), expr("approx_percentile(v, 0.95, 50000)")).collect())
    val factor = graft.ml.Normalization.trimmedMean(col("__r.lr"), col("__r.ae"), -1, 1, -1, 1)
    t("gm")(mat.select((graft.util.Parity.dsum6(log(when(factor === 0.0, 1.0).otherwise(factor))) / count(lit(1))).as("m")).collect())
    t("score-out")(mat.withColumn("nf", factor).drop("__r").write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
