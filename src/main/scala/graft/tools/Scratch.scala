package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev scratchpad main — ad-hoc probes during development; not part of the
  * engine surface and free of engine logic.
  *
  * Current probe: exact-percentile partial bounding for the q83 binning
  * breaks — does `coalesce` before the buffering percentile aggregate help
  * (the TMM GK-sketch finding) when the aggregate holds raw values?
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val d = "/root/testdata/sf0.1"
    val li = graft.io.Tables.lineitem(spark, d)
    t("warm")(li.count())
    val pct = "percentile(l_extendedprice, array(0.25, 0.5, 0.75))"
    for (i <- 1 to 2) {
      t(s"exact_asis_$i")(li.selectExpr(pct).collect())
      t(s"exact_fan_coalesce8_$i")(
        graft.relational.Scale.fanOut(li.select("l_extendedprice"))
          .coalesce(8).selectExpr(pct).collect())
      t(s"exact_fanned_$i")(
        graft.relational.Scale.fanOut(li.select("l_extendedprice")).selectExpr(pct).collect())
    }
    spark.stop()
  }
}
