package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev scratchpad main — ad-hoc probes during development; not part of the
  * engine surface and free of engine logic.
  *
  * Current probe: per-stage timing of connectedComponents on the sf0.1 LSH
  * pairs to locate a 2× regression after the cache-discipline restructure.
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
    val docs = graft.io.Tables.documents(spark, d)
    val aug = docs.select(col("doc_id"), col("text")).unionByName(
      docs.filter(pmod(col("doc_id"), lit(7)) === 0)
        .select((col("doc_id") + 500000).as("doc_id"),
          expr("substring(text, instr(text, ' ') + 1, length(text))").as("text")))
    val pairs = t("pairs") {
      val p = graft.dedup.Dedup.candidatePairs(
        graft.dedup.Dedup.bandTable(aug, "doc_id", "text"), "doc_id")
      p.count(); p
    }
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst"))).persist(lvl)
    var round = t("init") {
      val r = edges.select(col("src").as("node")).distinct()
        .withColumn("old", col("node")).withColumn("comp", col("node")).persist(lvl)
      r.count(); r
    }
    var changed = 1L; var it = 0
    while (changed > 0 && it < 20) {
      val nbrMin = edges.join(round.select(col("node").as("dst"), col("comp")), "dst")
        .groupBy(col("src").as("node")).agg(min("comp").as("nbr"))
      val next = round.select("node", "comp").join(nbrMin, Seq("node"), "left")
        .select(col("node"), col("comp").as("old"),
          least(col("comp"), coalesce(col("nbr"), col("comp"))).as("comp")).persist(lvl)
      changed = t(s"round_$it")(next.filter(col("comp") =!= col("old")).count())
      println(s"  changed=$changed")
      round.unpersist(); round = next; it += 1
    }
    val result = t("final_persist") {
      val r = round.select("node", "comp").persist(lvl); r.count(); r
    }
    t("rollup")(result.groupBy("comp").agg(count(lit(1))).collect())
    spark.stop()
  }
}
