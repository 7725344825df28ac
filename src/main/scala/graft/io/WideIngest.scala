package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-time canonicalization of an extremely wide feature parquet (one
  * column per gene — the reference's BRCA matrix is 1205 × 60,483,
  * `brca_data_prep.ipynb` cell-14) into the engine's array layout
  * `(key, features: Array[Double])` plus a `(pos, gene)` name sidecar.
  *
  * Rationale (SURVEY §7.4.1): tens of thousands of Catalyst attributes per
  * plan break naive per-column processing (analyzer/codegen blowup), so the
  * wide shape is read ONCE, collapsed into a single array column, and
  * re-written as canonical parquet — mirroring the reference's own one-time
  * prep step (`brca_data_prep.ipynb` cell-17/20). Column NAMES are data
  * (gene IDs, selected by regex masks — P4), so they are preserved
  * positionally in the sidecar rather than discarded.
  *
  * The single `array(...)` projection keeps exactly one wide plan in the
  * whole system; everything downstream (normalization, masks, stats, ML)
  * operates on the array column at any width.
  */
object WideIngest {

  /** Collapse `widePath` (one double column per feature + `keyCol`) into
    * array-layout parquet at `outPath`, writing the positional gene-name
    * sidecar to `namesPath`. Column order of the parquet schema defines
    * array position. */
  def canonicalize(spark: SparkSession, widePath: String, keyCol: String,
                   outPath: String, namesPath: String): Unit = {
    val wide = spark.read.parquet(widePath)
    val genes = wide.schema.fieldNames.filterNot(_ == keyCol).toSeq
    wide.select(col(keyCol),
        array(genes.map(g => col(g).cast("double")): _*).as("features"))
      .write.mode("overwrite").parquet(outPath)
    spark.createDataFrame(genes.zipWithIndex.map { case (g, i) => (i, g) })
      .toDF("pos", "gene")
      .coalesce(1).write.mode("overwrite").parquet(namesPath)
  }

  /** Read back a canonicalized matrix: `(keyCol, features)`. */
  def readCanonical(spark: SparkSession, outPath: String): DataFrame =
    spark.read.parquet(outPath)

  /** Gene-name positions for a canonicalized matrix — e.g. to build a
    * regex-selected position mask (P4) at full width. */
  def readNames(spark: SparkSession, namesPath: String): DataFrame =
    spark.read.parquet(namesPath)

  /** Positions whose gene name matches `regex` — drives
    * [[graft.ml.Normalization.maskPositions]] without ever re-widening. */
  def positionsMatching(spark: SparkSession, namesPath: String, regex: String): Seq[Int] =
    readNames(spark, namesPath).filter(col("gene").rlike(regex))
      .orderBy("pos").select("pos").collect().map(_.getInt(0)).toSeq

  /** Deterministic LCG synthetic in the WIDE layout (the BRCA file shape):
    * `sample_id` + `f` double columns named like Ensembl ids, every 97th
    * gene all-zero. Generated from an array projection so only the final
    * select is wide. */
  def writeWideSynthetic(spark: SparkSession, path: String, n: Int, f: Int): Unit = {
    val arr = spark.range(n.toLong).select(
      col("id").as("sample_id"),
      transform(sequence(lit(0), lit(f - 1)), c => {
        val h = pmod((col("id") * f + c) * 1103515245L + 12345L, lit(2147483647L))
        when(pmod(c, lit(97)) === 0, 0.0)
          .otherwise(h.cast("double") / 2147483647.0 * 100.0)
      }).as("features"))
    val cols = col("sample_id") +:
      (0 until f).map(i => col("features")(i).as(f"ENSG${i}%011d"))
    arr.select(cols: _*).write.mode("overwrite").parquet(path)
  }
}
