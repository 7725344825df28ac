package graft.relational

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

/** Join surface (SURVEY §2.3). The reference performs joins three ways —
  * `isin` semi-joins (J1), dict-lookup broadcast joins (J2) and positional
  * zip alignment (J3) — all re-expressed as real Spark joins so Catalyst
  * picks broadcast/shuffled-hash/sort-merge by stats and AQE can re-plan.
  */
object Joins {

  /** J1 — semi-join (`brca_data_prep.ipynb` cell-14 `isin`): rows of `left`
    * with a match in `right`; no columns from `right`, no row duplication. */
  def semi(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_semi")

  /** Anti-join — rows of `left` with no match in `right`. */
  def anti(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_anti")

  /** J2 — small-side lookup remap (`brca_data_prep.ipynb` cell-6 dict
    * `.map`): explicit broadcast hash join, no shuffle of the big side. */
  def broadcastLookup(big: DataFrame, lookup: DataFrame, keys: Seq[String]): DataFrame =
    big.join(broadcast(lookup), keys)

  /** J3 — positional (zip) join (`functions/dask_pipeline.py:48-52` aligned
    * partitions; `cluster_default_benchmark.py:83`). Spark has no implicit
    * row order, so position is made explicit: total-order sort →
    * `zipWithIndex` (a narrow, single-pass index assignment — NOT a
    * single-partition window, so it scales) → join on `row_id`.
    *
    * Preferred design is to never separate the aligned tables (carry labels
    * as a column, SURVEY §7.2.2); this op exists for ingest of pre-split
    * positional data.
    */
  def zipWithRowId(df: DataFrame, sortCols: Seq[Column], idCol: String = "row_id"): DataFrame = {
    val sorted = df.orderBy(sortCols: _*)
    val schema = sorted.schema.add(StructField(idCol, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    sorted.sparkSession.createDataFrame(rdd, schema)
  }

  /** Positional join of two independently-sorted tables on synthesized row ids. */
  def zipJoin(left: DataFrame, leftSort: Seq[Column],
              right: DataFrame, rightSort: Seq[Column]): DataFrame =
    zipWithRowId(left, leftSort).join(zipWithRowId(right, rightSort), "row_id")
}
