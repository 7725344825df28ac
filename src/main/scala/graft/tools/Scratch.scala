package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev scratchpad main — not part of the engine surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").createOrReplaceTempView("li")
    spark.sql("""SELECT percentile(l_extendedprice, 0.3d), percentile(l_extendedprice, 0.95d),
      percentile(CASE WHEN l_quantity > 25 THEN l_extendedprice END, 0.75d) FROM li""")
      .collect().foreach(r => println(s"SPARKQ: ${r.getDouble(0)}, ${r.getDouble(1)}, ${r.getDouble(2)}"))
    spark.stop()
  }
}
