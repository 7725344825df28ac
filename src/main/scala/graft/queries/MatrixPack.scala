package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.io.Tables
import graft.matrix.ArrayOps
import graft.ml.Normalization

/** Array-layout (matrix) surface: row-wise aggregates, elementwise maps,
  * and the UpperQuartile normalization estimator (SURVEY §2.4 A4–A7,
  * §2.5 F1–F4, §2.9 M1) — exercised on the embeddings table and on a
  * 4-column matrix derived from lineitem.
  */
object MatrixPack extends QueryPack {

  private def q7(ls: String, n: Int, q: Double): String = Sql.q7(ls, n, q)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A4 — per-row exact sum (order-independent decimal) + type-7 quantiles
    // over the 64-dim embedding vectors; one codegen'd expression per row.
    "q16_row_moments" -> { (s, d) =>
      val arr = transform(col("embedding"), _.cast("double"))
      Tables.embeddings(s, d).select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("n_dims"),
        ArrayOps.rowSumExact(arr).as("row_sum"),
        ArrayOps.rowQuantile(arr, 0.25).as("q25"),
        ArrayOps.rowQuantile(arr, 0.50).as("median"),
        ArrayOps.rowQuantile(arr, 0.75).as("q75"))
    },

    // F4/P5/P6 — elementwise maps and in-row filters.
    "q17_row_transform" -> { (s, d) =>
      val arr = transform(col("embedding"), _.cast("double"))
      Tables.embeddings(s, d).select(
        col("vec_id"),
        size(ArrayOps.positives(arr)).cast("long").as("n_pos"),
        array_max(arr).as("max_val"),
        ArrayOps.rowSumExact(transform(arr, x => greatest(x, lit(0.0)))).as("relu_sum"))
    },

    // M1 — UpperQuartile normalization factors on a 4-column positive
    // matrix from lineitem: per-row q75/sum, symmetrized by the geometric
    // mean of all factors (exact-decimal mean of logs).
    "q18_uq_factors" -> { (s, d) =>
      // fan the single-split scan out and CACHE it: the fit's stat jobs and
      // the per-row factor output pass (4 actions) are all CPU-bound
      // rowQuantile math — without the persist each action would re-run the
      // fan-out shuffle; without the fan-out they all run on one core
      val li = graft.relational.Scale.fanOut(
          Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
            ArrayOps.toArray(Seq(col("l_quantity"), col("l_extendedprice"),
              lit(1.0) + col("l_discount"), lit(1.0) + col("l_tax"))).as("features")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val model = new Normalization.UpperQuartile(0.75, "features").fit(li)
      li.select(col("l_orderkey"), col("l_linenumber"),
        model.normFactor.as("norm_factor"),
        round(model.scalingFactor, 6).as("scaling_factor"))
    }
  )

  override def oracles: Map[String, String] = Map(
    "q16_row_moments" ->
      s"""WITH m AS (SELECT vec_id, len(embedding) AS n, list_sort(CAST(embedding AS DOUBLE[])) AS ls FROM embeddings),
          sums AS (SELECT vec_id, CAST(SUM(CAST(e AS DECIMAL(28,6))) AS DOUBLE) AS row_sum
                   FROM (SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS e FROM embeddings) GROUP BY vec_id)
          SELECT m.vec_id, CAST(m.n AS BIGINT) AS n_dims, sums.row_sum,
                 ${q7("ls", 64, 0.25)} AS q25,
                 ${q7("ls", 64, 0.50)} AS median,
                 ${q7("ls", 64, 0.75)} AS q75
          FROM m JOIN sums ON m.vec_id = sums.vec_id""",

    "q17_row_transform" ->
      """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS arr FROM embeddings),
            sums AS (SELECT vec_id, CAST(SUM(CAST(greatest(e, 0.0) AS DECIMAL(28,6))) AS DOUBLE) AS relu_sum
                     FROM (SELECT vec_id, unnest(arr) AS e FROM base) GROUP BY vec_id)
         SELECT b.vec_id, CAST(len(list_filter(b.arr, x -> x > 0)) AS BIGINT) AS n_pos,
                list_max(b.arr) AS max_val, sums.relu_sum
         FROM base b JOIN sums USING (vec_id)""",

    "q18_uq_factors" ->
      """WITH m AS (
           SELECT l_orderkey, l_linenumber,
                  [CAST(l_quantity AS DOUBLE), CAST(l_extendedprice AS DOUBLE),
                   CAST(1.0 + l_discount AS DOUBLE), CAST(1.0 + l_tax AS DOUBLE)] AS arr
           FROM lineitem),
         f AS (
           SELECT l_orderkey, l_linenumber,
                  (ls[3] + (ls[4] - ls[3]) * 0.25) / (arr[1] + arr[2] + arr[3] + arr[4]) AS norm_factor
           FROM (SELECT *, list_sort(arr) AS ls FROM m)),
         g AS (
           SELECT exp(CAST(SUM(CAST(ln(CASE WHEN norm_factor = 0 THEN 1 ELSE norm_factor END) AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)) AS gm
           FROM f)
         SELECT l_orderkey, l_linenumber, norm_factor,
                round(norm_factor / gm, 6) AS scaling_factor
         FROM f, g"""
  )
}
