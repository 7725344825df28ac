package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge list — the standard distributed
  * shape (contributions shuffle on dst, ranks shuffle on node), kept
  * cross-engine deterministic so an exact SQL replay can oracle it.
  *
  * Scale notes (the 100 TB story):
  *  - each iteration is exactly two hash shuffles: edges⋈ranks on `src`
  *    (co-partitioned after the first round — Spark reuses the exchange),
  *    then groupBy(`dst`) with map-side partial aggregation;
  *  - per-node rank contributions are quantized to 1e-15 fixed-point and
  *    summed as LONGs, so the per-iteration sum is exact integer
  *    arithmetic — independent of partition merge order AND identical in
  *    any replaying engine. (A decimal cast does not work here: Spark
  *    casts double→decimal through the shortest string representation
  *    while other engines round the exact binary expansion, and at scale
  *    18 the two disagree — float drift would then compound per
  *    iteration.) Total mass is ≤ 1, so the unit sum stays ≤ 1e15, well
  *    inside both long and exact-double range;
  *  - ranks are persisted per round and the previous round released, so
  *    lineage stays one-round deep (the [[graft.dedup.Dedup]] CC lesson);
  *  - dangling nodes (no out-edges) leak their mass rather than
  *    redistributing it — documented variant, identical in the oracle.
  */
object PageRank {

  /** @param edges two-column frame (`src`, `dst`), assumed deduplicated.
    * @return (node, rank) for every node appearing as src or dst. The
    *         returned frame is PERSISTED (it is the last iteration's
    *         materialized state): the caller owns the release and must
    *         `unpersist()` it when done — the same contract as
    *         [[graft.dedup.Dedup.connectedComponents]]. Inside the query
    *         packs the session-level cache discipline (Verify/Bench clear
    *         the cache after every query) is that release; CacheSpec
    *         asserts a full pass leaves nothing persisted.
    */
  def run(edges: DataFrame, iterations: Int, damping: Double): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col("src").cast("long"), col("dst").cast("long")).persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val n = nodes.count().toDouble
    // mirror the oracle's op order exactly: base = (1.0 - d) / N
    val base = (1.0 - damping) / n

    // out-degree folded into the persisted edge table once, so each
    // iteration is a single join (edges ⋈ ranks) instead of two
    val ew = e.join(e.groupBy("src").agg(count(lit(1)).cast("double").as("outdeg")), "src")
      .persist()
    ew.count()

    var ranks = nodes.withColumn("rank", lit(1.0) / lit(n)).persist()
    ranks.count()
    for (_ <- 1 to iterations) {
      val contribs = ew.join(ranks, ew("src") === ranks("node"))
        .select(col("dst").as("node"), (col("rank") / col("outdeg")).as("contrib"))
      val next = nodes.join(
          contribs.groupBy("node")
            .agg((sum(round(col("contrib") * lit(1e15)).cast("long")).cast("double")
              / lit(1e15)).as("s")),
          Seq("node"), "left")
        .select(col("node"),
          (lit(base) + lit(damping) * coalesce(col("s"), lit(0.0))).as("rank"))
        .persist()
      next.count()
      ranks.unpersist()
      ranks = next
    }
    e.unpersist(); ew.unpersist(); nodes.unpersist()
    ranks
  }
}
