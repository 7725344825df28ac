package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale patterns for hostile data distributions (SURVEY §4 / task brief):
  * key salting for skewed joins and bucketed tables for shuffle-free
  * co-located joins. Results are always identical to the plain join —
  * these ops only change the physical distribution of work.
  */
object Scale {

  /** Skew-salted equi-join: the skewed (big) side gets a random salt in
    * [0, saltFactor); the small side is replicated `saltFactor`× with every
    * salt value; the join key becomes (keys..., salt). A hot key's rows now
    * spread over `saltFactor` reducers instead of one. The salt is
    * `rand()`-based — membership of a row in a salt bucket is
    * nondeterministic, but the JOIN RESULT is provably invariant, which is
    * what the oracle checks. AQE's skew-join handles moderate skew
    * automatically; explicit salting is for the pathological keys AQE's
    * split thresholds miss.
    */
  def saltedJoin(skewed: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    // replicating the small side breaks right/full-outer semantics (every
    // unmatched small-side row would surface saltFactor times), so only
    // join types whose result is provably salt-invariant are allowed
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
        .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left_outer/left_semi/left_anti, got $joinType")
    val saltedBig = skewed.withColumn("__salt", (rand(42) * saltFactor).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedBig.join(saltedSmall, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Write a table bucketed (and sorted) by join key: joins between tables
    * bucketed the same way need no shuffle and no sort — each bucket pair
    * joins independently. The 100 TB pattern for repeatedly-joined fact
    * tables. Uses the session catalog (`saveAsTable`; bucketing metadata
    * does not survive plain `.parquet` paths). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, key: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", s"/root/repo/target/scratch/bucketed_$table")
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
