package graft.relational

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data layout.
  *
  * Sorting / range-partitioning a table by the bit-interleaved key of two
  * filter columns clusters rows so that EVERY file covers a small rectangle
  * in (x, y) space — parquet min/max row-group stats then prune reads for
  * predicates on EITHER column, where a plain sort only prunes its leading
  * column. This is the layout step behind Delta/Iceberg `OPTIMIZE ZORDER
  * BY`, expressed as a plain Catalyst expression: `repartitionByRange(N,
  * zvalue).sortWithinPartitions(zvalue).write.parquet(...)` is the whole
  * 100 TB job — one range shuffle, no driver involvement.
  *
  * The z-value is built from Spark built-ins only (shiftright / bitwise-AND
  * / shiftleft / sum) so it stays inside whole-stage codegen, and the
  * identical arithmetic is replayable in DuckDB ([[zValueSql]]) for the
  * oracle gate.
  */
object ZOrder {

  /** Morton code of `(x, y)`, `bits` bits per dimension (result uses
    * `2*bits` bits). Inputs are reduced mod 2^bits so any long key is
    * accepted; bit i of x lands at position 2i, bit i of y at 2i+1. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits per dimension must be in [1,31]")
    val xm = pmod(x.cast("long"), lit(1L << bits))
    val ym = pmod(y.cast("long"), lit(1L << bits))
    (0 until bits).map { i =>
      shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Pure-Scala reference of [[zValue]] (property tests compare against
    * it; keep in lockstep with the Column formula). */
  def ref(x: Long, y: Long, bits: Int): Long = {
    val m = 1L << bits
    val xm = ((x % m) + m) % m
    val ym = ((y % m) + m) % m
    (0 until bits).foldLeft(0L)((acc, i) =>
      acc + ((((xm >> i) & 1L) << (2 * i)) + (((ym >> i) & 1L) << (2 * i + 1))))
  }

  /** DuckDB twin of [[zValue]] over SQL expressions `x`, `y`. */
  def zValueSql(x: String, y: String, bits: Int): String = {
    val m = 1L << bits
    val xm = s"(((CAST($x AS BIGINT) % $m) + $m) % $m)"
    val ym = s"(((CAST($y AS BIGINT) % $m) + $m) % $m)"
    (0 until bits).map { i =>
      s"((($xm >> $i) & 1) << ${2 * i}) + ((($ym >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")
  }
}
