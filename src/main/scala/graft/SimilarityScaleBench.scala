package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.similarity.Similarity

/** ANN-path scaling proof (the similarity twin of [[DedupScaleBench]]):
  * the driver corpus is 500 vectors, far too small to say anything about
  * corpus-scale behavior, so this main sweeps [[Similarity.indexCells]] →
  * [[Similarity.ivfTopKIndexed]] over a synthetic embedding corpus at
  * n = 100k / 400k / 1.6M vectors (dim 32, 64 cells, nprobe 8, k 10) and
  * prints one JSON line per cell with per-stage wall time, the cell-size
  * distribution, and recall — for BOTH dot paths: the oracle-exact
  * decimal one (`exact=true`, what q67 gates on) and the production IEEE
  * fast path (`exact=false`, `DoubleDot`), whose recall must not move.
  *
  * The corpus is deterministic (QUADRATIC mixed-modulus integer hash per
  * (seed, dim), no rand()). The nonlinearity is load-bearing and was
  * found the hard way twice: a single LCG makes every vector the same
  * arithmetic progression with a per-seed shift (corpus collapses onto a
  * 1-parameter family), and even two stacked LINEAR stages keep the
  * per-dim increment constant, so every id-pair whose seed difference
  * lands near a modular root becomes a near-duplicate FAMILY — both
  * produce accidental cos≈1 pairs that outrank the planted neighbors
  * (recall_planted measured 0.10 and 0.88 respectively; 1.00 with the
  * arg² term, cross-checked against an independent numpy replica):
  * every 40th vector is a planted near-duplicate of its predecessor (same
  * seed, dim-0 nudged by +0.01), so each sampled query's true nearest
  * neighbor is KNOWN BY CONSTRUCTION — `recall_planted` (is the planted
  * neighbor in the IVF top-k?) is exact at every n without a corpus-scale
  * brute-force pass. `recall_at10` additionally compares the full IVF
  * top-10 against [[Similarity.bruteForceTopK]] on the same query sample,
  * at the smallest n by default (the brute pass is O(|Q|·|C|) — that cost
  * is the point of IVF; set SPARK_GRAFT_ANN_BRUTE_ALL=1 to force it
  * everywhere).
  *
  * What a failure looks like: a hot centroid cell shows as max_cell ≫
  * mean_cell (probe cost concentrates), recall collapse shows as
  * recall_planted dropping with n (cells too coarse for the corpus), and
  * an accidental corpus-wide scoring shows as probe_sec growing ~linearly
  * with n instead of with n/cells·nprobe·|Q|. Numbers recorded in
  * BASELINE.md; not part of the per-round driver protocol.
  * Round-7 extension: `SPARK_GRAFT_ANN_NPROBES` sweeps the probe width
  * (one JSON line per (n, nprobe); the brute oracle is computed ONCE per
  * n and reused across the sweep — brute is nprobe-independent), and
  * `SPARK_GRAFT_ANN_BRUTE_MAX` raises the largest n that pays for the
  * brute pass (default: smallest n), so the 100 TB recall/latency
  * trade-off is chosen from a recall@10 × nprobe × n CURVE rather than
  * one measured point.
  *
  * Env: SPARK_GRAFT_CPUS, SPARK_GRAFT_ANN_NS (comma list),
  * SPARK_GRAFT_ANN_NPROBES (comma list), SPARK_GRAFT_ANN_BRUTE_MAX,
  * SPARK_GRAFT_ANN_BRUTE_ALL.
  */
object SimilarityScaleBench {

  val Dim = 32
  val NCells = 64
  val NProbe = 8
  val K = 10

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val ns = sys.env.getOrElse("SPARK_GRAFT_ANN_NS", "100000,400000,1600000")
      .split(",").map(_.trim.toInt).toSeq
    val nprobes = sys.env.getOrElse("SPARK_GRAFT_ANN_NPROBES", NProbe.toString)
      .split(",").map(_.trim.toInt).toSeq
    val bruteAll = sys.env.get("SPARK_GRAFT_ANN_BRUTE_ALL").contains("1")
    val bruteMax = sys.env.get("SPARK_GRAFT_ANN_BRUTE_MAX").map(_.trim.toInt)
      .getOrElse(ns.min)
    val spark = graft.core.GraftSession.configure(
        SparkSession.builder().master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus),
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (n <- ns) {
      // seed = the id whose LCG stream this vector carries; planted
      // near-dups share their predecessor's seed and nudge dim 0
      val corpus = spark.range(n.toLong).select(
          col("id").as("vec_id"),
          when(pmod(col("id"), lit(40)) === 0 && col("id") > 0, col("id") - 1)
            .otherwise(col("id")).as("__seed"),
          (pmod(col("id"), lit(40)) === 0 && col("id") > 0).as("__dup"))
        .select(col("vec_id"),
          transform(sequence(lit(0), lit(Dim - 1)), i => {
            // arg² makes the hash nonlinear in the dim index (see scaladoc);
            // every multiply stays far below Long overflow (ANSI-safe)
            val arg = col("__seed") * Dim + i.cast("long")
            val mixed = pmod(arg * arg + arg * lit(2654435761L), lit(1000000007L))
            (pmod(mixed * lit(1103515245L) + lit(12345L),
              lit(998244353L)).cast("double") / lit(998244353.0) * 2.0 - 1.0) +
              when(i === lit(0) && col("__dup"), lit(0.01)).otherwise(lit(0.0))
          }).as("v"))
        .repartition(cpus.toInt) // synthetic range: give every core a slice
      // centroids: a fixed arithmetic sample of NON-planted vectors —
      // deterministic, spread across the id space
      val cStride = math.max(1L, n.toLong / NCells)
      val cents = corpus
        .filter(pmod(col("vec_id"), lit(cStride)) === 3 && col("vec_id") < lit(cStride * NCells))
        .select(col("vec_id").as("__cell"), col("v").as("__cv"))
      // queries: ~100 planted near-dups spread across the id space; each
      // one's true NN is vec_id − 1 by construction
      val qStride = math.max(1L, (n.toLong / 40) / 100) * 40
      val queries = corpus
        .filter(pmod(col("vec_id"), lit(40)) === 0 && col("vec_id") > 0 &&
          pmod(col("vec_id"), lit(qStride)) === 0)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      val nQ = queries.count()

      // ── stage 1: index (once per corpus at 100 TB) ─────────────────────
      val t0 = System.nanoTime()
      val indexed = Similarity.indexCells(corpus, cents, "v")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      indexed.count()
      val tIndex = (System.nanoTime() - t0) / 1e9
      val hist = indexed.groupBy("__cell").count()
        .agg(max(col("count")).as("mx"), avg(col("count")).as("mean"),
          count(lit(1)).as("cells")).collect().head
      val (maxCell, meanCell, usedCells) = (hist.getLong(0), hist.getDouble(1), hist.getLong(2))

      // the fast index is shared across the nprobe sweep too
      val t3 = System.nanoTime()
      val idxF = Similarity.indexCells(corpus, cents, "v", exact = false)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      idxF.count()
      val tIndexF = (System.nanoTime() - t3) / 1e9

      try {
        // brute-force oracle ONCE per n (O(|Q|·|C|) — that cost is the
        // point of IVF), shared across the whole nprobe sweep. Above
        // bruteMax the oracle runs on a deterministic ~20-query SUBSAMPLE
        // instead of being skipped (round-7: the 1.6M recall cell was a
        // dash) — recall estimates then carry `"brute_mode":"sampled"`.
        val (bruteQ, bruteMode) =
          if (n <= bruteMax || bruteAll) (queries, "full")
          else {
            val step = math.max(1L, nQ / 20)
            (queries.withColumn("__rn",
                row_number().over(org.apache.spark.sql.expressions.Window.orderBy("q_id")))
              .filter(pmod(col("__rn"), lit(step)) === 0).drop("__rn"), "sampled")
          }
        val bruteN = bruteQ.count()
        val (brute, bruteSec) = {
          val t2 = System.nanoTime()
          val b = Similarity.bruteForceTopK(bruteQ, corpus,
              "q_id", "vec_id", "qv", "v", k = K)
            .select("q_id", "vec_id")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          b.count()
          (Some(b), f"${(System.nanoTime() - t2) / 1e9}%.2f")
        }

        for (nprobe <- nprobes) {
          // ── stage 2: probe + exact re-score within candidates ──────────
          val t1 = System.nanoTime()
          val ivf = Similarity.ivfTopKIndexed(indexed, queries, cents,
              "q_id", "vec_id", "qv", "v", k = K, nprobe = nprobe)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          ivf.count()
          val tProbe = (System.nanoTime() - t1) / 1e9

          // recall vs the construction-known planted neighbor, at every n
          val planted = ivf.filter(col("vec_id") === col("q_id") - 1)
            .select("q_id").distinct().count()
          val recallPlanted = planted.toDouble / nQ

          val recallAt10 = brute.map { b =>
            val inter = ivf.select("q_id", "vec_id").intersect(b).count()
            f"${inter.toDouble / (bruteN * K)}%.4f"
          }.getOrElse("null")
          ivf.unpersist()

          // ── production fast path (exact=false): IEEE dots end-to-end ──
          // same pipeline, no per-element decimal quantization — the
          // 100 TB index-build configuration; recall must not move
          val t4 = System.nanoTime()
          val ivfF = Similarity.ivfTopKIndexed(idxF, queries, cents,
              "q_id", "vec_id", "qv", "v", k = K, nprobe = nprobe, exact = false)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          ivfF.count()
          val tProbeF = (System.nanoTime() - t4) / 1e9
          val plantedF = ivfF.filter(col("vec_id") === col("q_id") - 1)
            .select("q_id").distinct().count()
          val recallAt10F = brute.map { b =>
            val inter = ivfF.select("q_id", "vec_id").intersect(b).count()
            f"${inter.toDouble / (bruteN * K)}%.4f"
          }.getOrElse("null")
          ivfF.unpersist()
          val recallPlantedF = plantedF.toDouble / nQ

          println(f"""ANNSCALE: {"n":$n,"nprobe":$nprobe,"queries":$nQ,"cells":$usedCells,"max_cell":$maxCell,"mean_cell":$meanCell%.0f,"index_sec":$tIndex%.2f,"probe_sec":$tProbe%.2f,"index_fast_sec":$tIndexF%.2f,"probe_fast_sec":$tProbeF%.2f,"recall_planted":$recallPlanted%.4f,"recall_planted_fast":$recallPlantedF%.4f,"recall_at10":$recallAt10,"recall_at10_fast":$recallAt10F,"brute_mode":"$bruteMode","brute_queries":$bruteN,"brute_sec":$bruteSec}""")
        }
        brute.foreach(_.unpersist())
      } finally { indexed.unpersist(); idxF.unpersist() }
    }
    spark.stop()
  }
}
