package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Dedup-path scaling proof: the driver corpus is 500 documents, far too
  * small to say anything about 100 TB behavior, so this main sweeps a
  * synthetic corpus through the full near-dup pipeline —
  * minhash band table → LSH candidate pairs → connected components —
  * at n = 100k / 400k / 1.6M documents and prints one JSON line per cell.
  *
  * The corpus is deterministic: 40-word documents with per-document-unique
  * words (a shared small vocabulary would make distant documents exact
  * duplicates and blow the pair count up quadratically); every 100th
  * document is a near-duplicate of its predecessor
  * (same words, first word replaced), so expected pairs ≈ n/100 and the
  * pair graph stays candidate-sparse — the regime LSH banding is FOR. A
  * super-linear blowup in any stage (an accidental all-pairs product, a
  * hot bucket) is immediately visible as a non-linear wall-time curve.
  * Numbers are recorded in BASELINE.md. Not part of the per-round driver
  * protocol. Env: SPARK_GRAFT_CPUS, SPARK_GRAFT_DEDUP_NS (comma list).
  */
object DedupScaleBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val ns = sys.env.getOrElse("SPARK_GRAFT_DEDUP_NS", "100000,400000,1600000")
      .split(",").map(_.trim.toInt).toSeq
    val spark = graft.core.GraftSession.configure(
        SparkSession.builder().master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus),
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (n <- ns) {
      // seed = the id whose word sequence this document carries; near-dups
      // share their predecessor's seed and then perturb word 0
      val corpus = spark.range(n.toLong).select(
          col("id").as("doc_id"),
          when(pmod(col("id"), lit(100)) === 0 && col("id") > 0, col("id") - 1)
            .otherwise(col("id")).as("__seed"),
          (pmod(col("id"), lit(100)) === 0 && col("id") > 0).as("__dup"))
        .select(col("doc_id"),
          array_join(
            transform(sequence(lit(0), lit(39)), i =>
              concat(lit("w"),
                when(i === 0 && col("__dup"), concat(lit("d"), col("doc_id").cast("string")))
                  .otherwise((col("__seed") * 40 + i.cast("long")).cast("string")))),
            " ").as("text"))
        .repartition(cpus.toInt) // synthetic range: give every core a slice
      val t0 = System.nanoTime()
      val pairs = Dedup.candidatePairs(Dedup.bandTable(corpus, "doc_id", "text"), "doc_id")
      val nPairs = pairs.count()
      val tPairs = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val comps = Dedup.connectedComponents(pairs, "id_a", "id_b")
      val nComps = comps.select("comp").distinct().count()
      val tCc = (System.nanoTime() - t1) / 1e9
      pairs.unpersist()
      println(f"""DEDUPSCALE: {"n":$n,"pairs":$nPairs,"components":$nComps,"pairs_sec":$tPairs%.2f,"cc_sec":$tCc%.2f}""")
    }
    spark.stop()
  }
}
