package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Training-data wave-2 scaling proof: the driver corpus is 500–5,000
  * documents — far too small to say anything about 100 TB behavior — so
  * this main stages a synthetic corpus IN THE DOCUMENTS SCHEMA
  * (doc_id, text, lang, source, n_chars) at n = 100k / 400k / 1.6M and
  * runs the REAL registered query closures (q93/q94/q95/q97/q99/q100)
  * against it — the exact production code paths, not re-implementations.
  *
  * Corpus: 40 per-document-unique words per doc (so decontamination's
  * gram join stays candidate-sparse, the regime it is designed for);
  * benchmark members (doc_id % 17 == 0, q95's held-out predicate) and
  * planted-contaminated training docs (doc_id % 50 == 1) share a leading
  * 5-word prefix drawn from a 997-cycle, so expected contamination ≈
  * n/50 and every flag is plantable/verifiable. 20 sources.
  *
  * Linearity in wall-time per stage is the claim under test: a
  * super-linear curve would expose an accidental all-pairs product, a
  * hot broadcast, or a window that degenerates to a global sort. Numbers
  * recorded in BASELINE.md; not part of the per-round driver protocol.
  * Env: SPARK_GRAFT_CPUS, SPARK_GRAFT_TRAIN_NS (comma list),
  * SPARK_GRAFT_TRAIN_ONLY (comma-separated name substrings).
  */
object TrainScaleBench {

  private val Queries = Seq(
    "q93_doc_chunking", "q94_pii_redaction", "q95_decontamination",
    "q97_repetition_filter", "q99_mixture_sampling", "q100_sequence_packing",
    // the per-source cap A/B: window sort-all-rows vs mergeable top-k agg
    "q82_per_source_cap", "q107_per_source_cap_agg")

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val ns = sys.env.getOrElse("SPARK_GRAFT_TRAIN_NS", "100000,400000,1600000")
      .split(",").map(_.trim.toInt).toSeq
    val only = sys.env.get("SPARK_GRAFT_TRAIN_ONLY").map(_.split(",").toSeq)
    val spark = graft.core.GraftSession.configure(
        SparkSession.builder().master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus),
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (n <- ns) {
      val dir = s"/root/repo/target/scratch/trainscale_$n"
      val id = col("id")
      val marked = pmod(id, lit(17)) === 0 || pmod(id, lit(50)) === 1
      val text = array_join(
        transform(sequence(lit(0), lit(39)), j =>
          when(j < 5 && marked,
            concat(lit("c"), pmod(id, lit(997)).cast("string"), lit("_"), j.cast("string")))
            .otherwise(concat(lit("w"), (id * 40 + j.cast("long")).cast("string")))),
        " ")
      spark.range(n.toLong)
        .select(id.as("doc_id"), text.as("text"), lit("en").as("lang"),
          concat(lit("s"), pmod(id, lit(20)).cast("string")).as("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .repartition(cpus.toInt) // synthetic range: give every core a slice
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")

      for (q <- Queries if only.forall(_.exists(q.contains))) {
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"""TRAINSCALE: {"n":$n,"query":"$q","sec":$dt%.2f}""")
      }
      graft.util.Staging.deleteRecursive(dir)
    }
    spark.stop()
  }
}
