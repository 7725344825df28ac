package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Deduplication operators for training-data pipelines: exact (content
  * hash), MinHash+LSH banding (near-dup candidate generation), SimHash,
  * and exact n-gram Jaccard verification.
  *
  * Scale shape: signatures/sketches are computed as *projection
  * expressions* (no shuffle, no UDF); the only shuffles are the final
  * group-by on content hash / band signature — exactly the fan-in the
  * problem requires. Candidate pairs come from band-bucket joins, never
  * an all-pairs product.
  */
object Dedup {

  /** Exact dedup: group by md5(content), keep the smallest id as canonical
    * (hash-groupBy — one shuffle of (hash, id), not documents). */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** MinHash parameters: k = bands·rowsPerBand hash functions over a
    * Mersenne-prime field; a_j, b_j derive deterministically from j so the
    * DuckDB oracle can regenerate them. */
  object MinHashParams {
    val P = 2147483647L // 2^31 − 1
    val bands = 4
    val rowsPerBand = 4
    val k: Int = bands * rowsPerBand
    def a(j: Int): Long = (j * 2654435761L + 40503L) % P
    def b(j: Int): Long = (j * 1103515245L + 101L) % P
  }

  /** k minhash values over a 32-bit shingle-hash array — one pass via the
    * native [[org.apache.spark.sql.graft.MinHashSketch]] expression: the
    * shingle-hash child is evaluated once per row (the composed k×`array_min`
    * form re-evaluated the md5 hash chain k times — no CSE inside
    * interpreted HOFs; measured 16× slower). Zero shuffle, any length. */
  def minhashes(shingleHashes: Column): Column = {
    import MinHashParams._
    org.apache.spark.sql.graft.MinHashSketch(
      shingleHashes, P, (0 until k).map(a), (0 until k).map(b))
  }

  /** The composed k×`array_min(transform(...))` formulation — kept as the
    * executable spec that the native [[minhashes]] must match bit-for-bit
    * (see DedupTextSpec); do not use on the hot path. */
  def minhashesComposed(shingleHashes: Column): Column = {
    import MinHashParams._
    array((0 until k).map { j =>
      array_min(transform(shingleHashes,
        h => pmod(lit(a(j)) * pmod(h, lit(P)) + lit(b(j)), lit(P))))
    }: _*)
  }

  /** Band signature for one band β out of a minhash array: its rowsPerBand
    * values joined with '_'; docs sharing any band signature are near-dup
    * candidates (classic LSH banding). */
  def bandSignature(mh: Column, band: Column): Column =
    array_join(
      transform(slice(mh, band * MinHashParams.rowsPerBand + 1, lit(MinHashParams.rowsPerBand)),
        _.cast("string")), "_")

  /** (id, band, sig) long table for a corpus: the LSH index.
    *
    * Plan shape matters: the minhash array is materialized in its own
    * projection *below* the band explode. Referencing `minhashes(hs)` 16×
    * from one projection would re-evaluate the whole (non-codegen'd HOF)
    * minhash pipeline per reference — measured 16× slower at sf0.1. A
    * Generate between the two projections blocks CollapseProject, so the
    * array is computed exactly once per document. */
  def bandTable(df: DataFrame, idCol: String, textCol: String, ngram: Int = 3): DataFrame = {
    import MinHashParams._
    val sh = TextOps.wordNgrams(TextOps.words(col(textCol)), ngram)
    val hs = transform(sh, TextOps.hash32(_))
    df.filter(size(TextOps.words(col(textCol))) >= ngram)
      .select(col(idCol), minhashes(hs).as("mh"))
      .select(col(idCol), col("mh"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .select(col(idCol), col("band").cast("long").as("band"),
        bandSignature(col("mh"), col("band")).as("sig"))
  }

  /** Distinct candidate pairs (a < b) sharing at least one band signature.
    * The band table is persisted so both sides of the self-join reuse one
    * minhash computation, then RELEASED once the (much smaller) pair set is
    * materialized — holding the full band table cached across a session
    * accumulates blocks at corpus scale.
    *
    * CALLER CONTRACT: the returned frame IS the persisted pair set (already
    * materialized). A caller that fully consumes it — e.g. feeds it into
    * [[connectedComponents]], which builds and materializes its own caches —
    * must `unpersist()` the returned frame afterwards; a caller returning a
    * plan over it to the driver leaves it cached for that plan's action
    * (the session's `clearCache()` between bench runs reclaims it). */
  def candidatePairs(bandTab: DataFrame, idCol: String): DataFrame = {
    val bt = bandTab.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val l = bt.select(col(idCol).as("id_a"), col("band"), col("sig"))
    val r = bt.select(col(idCol).as("id_b"), col("band"), col("sig"))
    val pairs = l.join(r, Seq("band", "sig")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairs.count() // materialize pairs before dropping the band-table cache
    bt.unpersist()
    pairs
  }

  /** 32-bit SimHash over token hashes: bit β of the signature is the sign
    * of Σ_tokens (±1 by bit β of hash32(token)). One pass via the native
    * [[org.apache.spark.sql.graft.SimHash]] expression — the composed
    * 32×`aggregate` form re-evaluated the token-hash md5 chain 32 times
    * (no CSE inside interpreted HOFs). */
  def simhash32(tokenHashes: Column): Column =
    org.apache.spark.sql.graft.SimHash(tokenHashes, 32)

  /** The composed 32×`aggregate` formulation — kept as the executable spec
    * the native [[simhash32]] must match bit-for-bit (see DedupTextSpec);
    * do not use on the hot path. */
  def simhash32Composed(tokenHashes: Column): Column =
    (0 until 32).map { b =>
      val vote = aggregate(tokenHashes, lit(0L),
        (acc, h) => acc + when(h.bitwiseAND(lit(1L << b)) =!= 0L, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Exact Jaccard similarity of two shingle arrays (set semantics). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(array_distinct(a), array_distinct(b)))
    val uni = size(array_distinct(a)) + size(array_distinct(b)) - inter
    when(uni > 0, inter.cast("double") / uni.cast("double")).otherwise(lit(0.0))
  }

  /** Lineage-truncation strategy for [[connectedComponents]]' iterative
    * rounds (each round's plan embeds the previous round TWICE, so carrying
    * plans forward doubles the tree per round and OOMs the DRIVER on plan
    * compilation alone for deep components). */
  sealed trait Lineage
  object Lineage {
    /** Rebuild each round's DataFrame from its RDD: pins the round to a
      * leaf plan, but keeps the full RDD recompute chain — on a real
      * cluster a lost executor late in a deep run recomputes every prior
      * round. The local default (zero disk traffic). */
    case object RddRebuild extends Lineage
    /** Checkpoint each round: truncates BOTH the plan and the RDD lineage,
      * so a lost executor re-reads the last round from (reliable or local)
      * storage instead of recomputing the chain — the cluster-scale mode.
      * Uses `checkpoint()` when the context has a checkpoint dir (survives
      * executor loss), `localCheckpoint()` otherwise (executor-local). */
    case object Checkpoint extends Lineage
  }

  /** Connected components over an undirected pair list — the cluster
    * canonicalization step after candidate-pair generation: every document
    * in a near-dup cluster gets the cluster's MIN id as its component, so
    * "keep one per cluster" is a filter, not another join cascade.
    *
    * Iterative min-label propagation: each round every node takes
    * `min(own, min over neighbors)`; converges in O(component diameter)
    * rounds (near-dup clusters are tiny, 1–2 rounds; a chain-shaped graph
    * is the worst case). Each round is two hash-partitioned shuffles
    * (join on neighbor, group by node) over the edge list — the standard
    * large-graph formulation; no driver-side adjacency, so it runs at any
    * edge count. Deterministic: min-semantics, no randomness; both
    * [[Lineage]] modes produce identical components (asserted in
    * DedupTextSpec).
    *
    * The returned frame IS its own persisted, materialized cache — callers
    * may `unpersist()` it when done. All intermediate caches (edges, loop
    * rounds) are released before returning, on failure too. */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 20,
                          lineage: Lineage = Lineage.RddRebuild): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val spark = pairs.sparkSession
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .persist(lvl)
    // CACHE DISCIPLINE: unpersist must target the exact persisted frame —
    // Spark's non-cascading uncache matches by plan, so unpersisting a
    // projection OVER a persisted frame is a silent no-op and every round
    // would leak a full label-table cache. The loop therefore carries the
    // 3-column persisted frame itself and releases it round-by-round.
    var round = edges.select(col("src").as("node")).distinct()
      .withColumn("comp", col("node")).persist(lvl)
    try {
      round.count()
      var changed = 1L
      var it = 0
      while (changed > 0 && it < maxIter) {
        val nbrMin = edges.join(round.select(col("node").as("dst"), col("comp")), "dst")
          .groupBy(col("src").as("node")).agg(min("comp").as("nbr"))
        val nextPlan = round.select("node", "comp").join(nbrMin, Seq("node"), "left")
          .select(col("node"), col("comp").as("old"),
            least(col("comp"), coalesce(col("nbr"), col("comp"))).as("comp"))
        val next = lineage match {
          case Lineage.RddRebuild =>
            spark.createDataFrame(nextPlan.rdd, nextPlan.schema).persist(lvl)
          case Lineage.Checkpoint =>
            if (spark.sparkContext.getCheckpointDir.isDefined) nextPlan.checkpoint(eager = true)
            else nextPlan.localCheckpoint(eager = true)
        }
        changed = next.filter(col("comp") =!= col("old")).count()
        release(round)
        round = next
        it += 1
      }
      require(changed == 0, s"connectedComponents did not converge in $maxIter rounds")
      // re-materialize the 2-column result as ITS OWN cache and release the
      // loop's 3-column frame: handing back a projection over the loop cache
      // would leave callers unable to release it (plan-matching no-op trap).
      val result = round.select("node", "comp").persist(lvl)
      result.count()
      result
    } finally {
      edges.unpersist()
      release(round) // final round released here on success; failed round on error
    }
  }

  /** Release a loop round regardless of how it was materialized:
    * `unpersist()` covers CacheManager-backed persistence, but a
    * `localCheckpoint`ed round is persisted at the RDD level UNDER a
    * `LogicalRDD` leaf — Dataset.unpersist is a silent no-op there, so the
    * backing RDD is unpersisted directly (no-op for non-persisted RDDs,
    * e.g. the RddRebuild-mode leaves). */
  private def release(df: DataFrame): Unit = {
    df.unpersist()
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
  }
}
