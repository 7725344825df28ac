package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev scratchpad main — ad-hoc probes during development; not part of the
  * engine surface and free of engine logic. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // intentionally empty
    spark.stop()
  }
}
