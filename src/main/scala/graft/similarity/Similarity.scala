package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`):
  * exact-decimal cosine (engine-portable), brute-force top-k as the
  * correctness baseline, and sign-random-projection LSH bucketing as the
  * scale path (bucket join instead of all-pairs product).
  */
object Similarity {

  /** Exact-decimal dot product: each elementwise product rounds to a
    * DECIMAL(38,10) and sums exactly → order-independent, bit-identical in
    * Spark and DuckDB (aggregation order of doubles would not be). One
    * pass via the native [[org.apache.spark.sql.graft.DecimalDot]] — the
    * composed zip/fold chain allocated a zipped array plus a Decimal per
    * element, interpreted, and dominated the similarity queries. */
  def dotDec(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.DecimalDot(a, b)

  /** The composed zip_with/aggregate formulation — parity reference for
    * the native [[dotDec]] (see DedupTextSpec); do not use on hot paths. */
  def dotDecComposed(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") * y.cast("double")).cast("decimal(20,10)")),
      lit(BigDecimal(0)).cast("decimal(20,10)"),
      // (20,10)+(20,10) → (21,10); cast back keeps scale 10 exactly (values
      // are ≪ 1e10, so no digits are ever lost — stays bit-exact)
      (acc, x) => (acc + x).cast("decimal(20,10)")).cast("double")

  /** Cosine similarity on the exact-decimal path. */
  def cosineDec(a: Column, b: Column): Column =
    dotDec(a, b) / (sqrt(dotDec(a, a)) * sqrt(dotDec(b, b)))

  /** Plain IEEE-754 dot product — the PRODUCTION fast path
    * ([[org.apache.spark.sql.graft.DoubleDot]]): no per-element decimal
    * quantization, ~an order of magnitude cheaper than [[dotDec]]. Use
    * wherever no cross-engine oracle gates the result (the 100 TB index
    * build); agreement with the decimal path is spec-bounded
    * (DedupTextSpec). */
  def dotF(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.DoubleDot(a, b)

  private def dotOf(exact: Boolean): (Column, Column) => Column =
    if (exact) dotDec else dotF

  /** Deterministic LCG pseudo-random hyperplanes in [−1, 1]; pure integer
    * arithmetic so the oracle regenerates identical planes in SQL. */
  object Planes {
    val M = 2147483647L
    def value(plane: Int, dim: Int, width: Int): Double =
      ((plane.toLong * width + dim) * 1103515245L + 12345L) % M / M.toDouble * 2.0 - 1.0
    def plane(p: Int, width: Int): Array[Double] =
      Array.tabulate(width)(d => value(p, d, width))
  }

  /** Sign-random-projection bucket id: bit p = [dot(v, plane_p) > 0].
    * Cosine-similar vectors collide with high probability; near-dup search
    * becomes a bucket join. Dots use the exact-decimal path so bucket
    * assignment is engine-portable. */
  def signBucket(v: Column, nPlanes: Int, width: Int): Column =
    (0 until nPlanes).map { p =>
      val dot = dotDec(v, lit(Planes.plane(p, width)))
      when(dot > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Centroids collected to the driver with exact-decimal norms (the
    * driver-side replica of [[dotDec]]'s scale-10 quantization, so ranking
    * scores equal the oracle's `dt / sqrt(nrm)` bit-for-bit) or, on the
    * fast path, plain IEEE sums. Centroid sets are small by construction —
    * they must fit a broadcast either way. */
  private def collectCents(cents: DataFrame, cId: String, cVec: String,
                           exact: Boolean): Array[(Long, Array[Double], Double)] =
    cents.select(col(cId).cast("long"), col(cVec)).collect().map { r =>
      val cv = r.getSeq[Double](1).toArray
      val nrm =
        if (exact)
          cv.map(x => java.math.BigDecimal.valueOf(x * x).setScale(10, java.math.RoundingMode.HALF_UP))
            .foldLeft(java.math.BigDecimal.ZERO)(_.add(_)).doubleValue
        else cv.map(x => x * x).sum
      (r.getLong(0), cv, math.sqrt(nrm))
    }.sortBy(_._1)

  /** IVF cell scores as ONE per-row projection: `dot(v, c_j) / ||c_j||`
    * per centroid (monotone to cosine — the query-side norm divides out of
    * the argmax), sorted best-first with ties to the lowest centroid id.
    * No shuffle, no row multiplication: the 100 TB corpus is assigned to
    * cells at scan speed. */
  private def cellScores(vCol: String, cc: Array[(Long, Array[Double], Double)],
                         dot: (Column, Column) => Column): Column =
    sort_array(array(cc.map { case (cell, cv, nc) =>
      struct((dot(col(vCol), lit(cv)) / lit(nc)).as("s"), lit(-cell).as("c"))
    }: _*), asc = false)

  /** Assign every corpus vector to its nearest centroid cell (per-row
    * argmax, zero shuffle — the corpus is indexed at scan speed) and hoist
    * its norm. Adds `__cell` and `__cn`. At 100 TB this runs ONCE and the
    * result persists (parquet partitioned by `__cell`); queries then probe
    * the index via [[ivfTopKIndexed]] without re-scoring the corpus. */
  def indexCells(corpus: DataFrame, cents: DataFrame, cVec: String,
                 exact: Boolean = true): DataFrame = {
    val cc = collectCents(cents, "__cell", "__cv", exact)
    val dot = dotOf(exact)
    // the dot path is stamped into __cn's metadata so a probe with the
    // OTHER flag over a persisted index fails loudly instead of mixing
    // decimal corpus norms with IEEE query scores (silently-wrong cos)
    val md = new org.apache.spark.sql.types.MetadataBuilder()
      .putBoolean("graft.exact", exact).build()
    corpus
      .withColumn("__cell", -element_at(cellScores(cVec, cc, dot), 1).getField("c"))
      .withColumn("__cn", sqrt(dot(col(cVec), col(cVec))).as("__cn", md))
  }

  /** Probe phase over a pre-indexed corpus (the output of [[indexCells]],
    * possibly persisted): probe only the `nprobe` nearest cells per query,
    * score exactly within the candidate union. The probed query set
    * broadcasts, so the only wide exchange in the whole plan is the final
    * per-query top-k over candidates — |corpus| / |cells| × nprobe rows
    * instead of |corpus|. */
  def ivfTopKIndexed(indexed: DataFrame, queries: DataFrame, cents: DataFrame,
                     qId: String, cId: String, qVec: String, cVec: String,
                     k: Int, nprobe: Int, exact: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val idxMeta = indexed.schema("__cn").metadata
    require(!idxMeta.contains("graft.exact") || idxMeta.getBoolean("graft.exact") == exact,
      s"ivfTopKIndexed(exact=$exact) over an index built with exact=${idxMeta.getBoolean("graft.exact")}: " +
        "corpus norms and query scores would mix dot paths — rebuild the index or match the flag")
    val cc = collectCents(cents, "__cell", "__cv", exact)
    val dot = dotOf(exact)
    val probed = queries
      .withColumn("__cell",
        explode(transform(slice(cellScores(qVec, cc, dot), 1, nprobe), s => -s.getField("c"))))
      .withColumn("__qn", sqrt(dot(col(qVec), col(qVec))))
    val cand = indexed.join(broadcast(probed), Seq("__cell"))
      .filter(col(qId) =!= col(cId))
      .withColumn("cos", round(dot(col(qVec), col(cVec)) / (col("__qn") * col("__cn")), 6))
    val w = Window.partitionBy(qId).orderBy(col("cos").desc, col(cId).asc)
    cand.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(qId), col(cId), col("cos"), col("rank"))
  }

  /** IVF-style ANN top-k — the scale path beside [[bruteForceTopK]]:
    * [[indexCells]] + [[ivfTopKIndexed]] in one call (index recomputed;
    * use the two-phase form when the index is reused across query sets).
    * Recall is validated against the brute-force baseline (q35's protocol)
    * rather than assumed. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, cents: DataFrame,
              qId: String, cId: String, qVec: String, cVec: String,
              k: Int, nprobe: Int, exact: Boolean = true): DataFrame =
    ivfTopKIndexed(indexCells(corpus, cents, cVec, exact), queries, cents,
      qId, cId, qVec, cVec, k, nprobe, exact)

  /** Brute-force cosine top-k: broadcast the (small) query set against the
    * corpus, rank per query. The corpus side never shuffles; ranking is a
    * per-query-partition top-k. This is the exact baseline ANN variants are
    * validated against. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, qId: String, cId: String,
                     qVec: String, cVec: String, k: Int, exact: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dot = dotOf(exact)
    // norms hoisted to per-vector columns: recomputing ||v|| inside the
    // cosine of every (query, corpus) pair would redo the corpus-side norm
    // |queries| times (measured ~3× on the brute-force scan).
    val q2 = queries.withColumn("__qn", sqrt(dot(col(qVec), col(qVec))))
    val c2 = corpus.withColumn("__cn", sqrt(dot(col(cVec), col(cVec))))
    val joined = c2.crossJoin(broadcast(q2))
      .filter(col(qId) =!= col(cId))
      .withColumn("cos", round(dot(col(qVec), col(cVec)) / (col("__qn") * col("__cn")), 6))
    val w = Window.partitionBy(qId).orderBy(col("cos").desc, col(cId).asc)
    joined.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(qId), col(cId), col("cos"), col("rank"))
  }
}
