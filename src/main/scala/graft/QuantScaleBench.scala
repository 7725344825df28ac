package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.similarity.Similarity

/** q166's memory claim, measured at corpus scale: the scalar-quantized
  * (int8) index must be several× smaller RESIDENT than the full-precision
  * vectors, at essentially unchanged recall once the exact re-rank runs.
  * Sweeps the [[SimilarityScaleBench]] synthetic corpus (same planted
  * near-duplicate construction, so recall is known without a brute pass
  * at every n) and reports, per n:
  *
  *  - cached bytes of the full `array<double>` index vs the
  *    `array<tinyint>` code index (InMemoryRelation stats after a full
  *    materialization — the honest residency metric; parquet-on-disk
  *    bytes are also printed for the storage axis);
  *  - the quantized probe (IEEE dots against dequantized codes, approx
  *    top-4k) + full-precision re-rank wall, and planted recall;
  *  - recall@10 vs brute force at the smallest n (brute is the cost IVF
  *    and quantization both exist to avoid).
  *
  * Env: SPARK_GRAFT_CPUS, SPARK_GRAFT_QANN_NS (comma list, default
  * 100000,400000). Not part of the per-round driver protocol; numbers
  * recorded in BASELINE.md.
  */
object QuantScaleBench {

  val Dim = 32
  val K = 10

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val ns = sys.env.getOrElse("SPARK_GRAFT_QANN_NS", "100000,400000")
      .split(",").map(_.trim.toInt).toSeq
    val spark = graft.core.GraftSession.configure(
        SparkSession.builder().master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus),
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.storage.StorageLevel

    for (n <- ns) {
      // identical corpus construction to SimilarityScaleBench (planted
      // near-dup every 40th id; quadratic mixed-modulus hash)
      val corpus = spark.range(n.toLong).select(
          col("id").as("vec_id"),
          when(pmod(col("id"), lit(40)) === 0 && col("id") > 0, col("id") - 1)
            .otherwise(col("id")).as("__seed"),
          (pmod(col("id"), lit(40)) === 0 && col("id") > 0).as("__dup"))
        .select(col("vec_id"),
          transform(sequence(lit(0), lit(Dim - 1)), i => {
            val arg = col("__seed") * Dim + i.cast("long")
            val mixed = pmod(arg * arg + arg * lit(2654435761L), lit(1000000007L))
            (pmod(mixed * lit(1103515245L) + lit(12345L),
              lit(998244353L)).cast("double") / lit(998244353.0) * 2.0 - 1.0) +
              when(i === lit(0) && col("__dup"), lit(0.01)).otherwise(lit(0.0))
          }).as("v"))
        .repartition(cpus.toInt)

      // per-dim code range (the 2·Dim-double codebook)
      val st = corpus.agg(
        array((1 to Dim).map(i => min(element_at(col("v"), i))): _*).as("los"),
        array((1 to Dim).map(i => max(element_at(col("v"), i))): _*).as("his")).head()
      val los = st.getSeq[Double](0).toArray
      val his = st.getSeq[Double](1).toArray
      // codes shifted to [-128, 127] so the tinyint cast is ANSI-safe
      def codeOf = transform(col("v"), (x, i) => {
        val lo = element_at(lit(los), i + 1)
        val sc = element_at(lit(his), i + 1) - lo
        (when(sc === 0, lit(0.0)).otherwise(round((x - lo) / sc * 255)) - 128)
          .cast("tinyint")
      })
      def dequant(codes: org.apache.spark.sql.Column) =
        transform(codes, (c, i) => {
          val lo = element_at(lit(los), i + 1)
          val sc = element_at(lit(his), i + 1) - lo
          lo + (c.cast("double") + 128.0) / 255.0 * sc
        })

      // resident bytes via storage-info DELTAS (measured sequentially)
      def storedBytes(): Long =
        spark.sparkContext.getRDDStorageInfo.map(i => i.memSize + i.diskSize).sum
      def cachedBytes(df: org.apache.spark.sql.DataFrame): Long = {
        val before = storedBytes()
        df.persist(StorageLevel.MEMORY_AND_DISK)
        df.count()
        storedBytes() - before
      }

      val full = corpus.select(col("vec_id"), col("v"))
      val quant = corpus.select(col("vec_id"), codeOf.as("codes"))
      val fullBytes = cachedBytes(full)
      val quantBytes = cachedBytes(quant)

      val queries = corpus
        .filter(pmod(col("vec_id"), lit(40)) === 0 && col("vec_id") > 0 &&
          pmod(col("vec_id"), lit(math.max(1L, (n.toLong / 40) / 100) * 40)) === 0)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nQ = queries.count()

      // quantized probe: IEEE dots against the dequantized codes
      // (production path), approx top-4K → full-precision re-rank
      import org.apache.spark.sql.expressions.Window
      val t0 = System.nanoTime()
      val scored = full.join(quant, "vec_id")
        .withColumn("vh", dequant(col("codes")))
        .withColumn("nv", sqrt(Similarity.dotF(col("vh"), col("vh"))))
        .crossJoin(broadcast(queries
          .withColumn("nq", sqrt(Similarity.dotF(col("qv"), col("qv"))))))
        .filter(col("q_id") =!= col("vec_id"))
        .withColumn("acos", Similarity.dotF(col("qv"), col("vh")) / (col("nq") * col("nv")))
      val wa = Window.partitionBy("q_id").orderBy(col("acos").desc, col("vec_id").asc)
      val cand = scored.withColumn("ar", row_number().over(wa)).filter(col("ar") <= 4 * K)
        .select("q_id", "vec_id", "qv", "nq")
      val wr = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id").asc)
      val top = full.withColumn("nvf", sqrt(Similarity.dotF(col("v"), col("v"))))
        .join(broadcast(cand), "vec_id")
        .withColumn("cos", Similarity.dotF(col("qv"), col("v")) / (col("nq") * col("nvf")))
        .withColumn("rank", row_number().over(wr)).filter(col("rank") <= K)
        .select("q_id", "vec_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
      top.count()
      val probeSec = (System.nanoTime() - t0) / 1e9
      val planted = top.filter(col("vec_id") === col("q_id") - 1)
        .select("q_id").distinct().count()
      val recallPlanted = planted.toDouble / nQ

      val recallAt10 =
        if (n == ns.min) {
          val b = Similarity.bruteForceTopK(queries, full,
            "q_id", "vec_id", "qv", "v", k = K).select("q_id", "vec_id")
          f"${top.intersect(b).count().toDouble / (nQ * K)}%.4f"
        } else "null"

      println(f"""QUANTSCALE: {"n":$n,"queries":$nQ,"full_bytes":$fullBytes,"quant_bytes":$quantBytes,"ratio":${fullBytes.toDouble / quantBytes}%.2f,"probe_sec":$probeSec%.2f,"recall_planted":$recallPlanted%.4f,"recall_at10":$recallAt10}""")
      top.unpersist(); queries.unpersist(); full.unpersist(); quant.unpersist()
    }
    spark.stop()
  }
}
