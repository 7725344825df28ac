package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}

/** SQL registration for graft's custom Catalyst expressions, so e.g.
  * `spark.sql("SELECT array_quantile_t7(arr, 0.75) ...")` works alongside
  * the Column API. Scalar-literal parameters (simhash bits, scale-row
  * factor is a column, decimal-dot none) fold from foldable expressions at
  * registration-call time. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[ClassicSession].sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "array_quantile_t7",
      exprs => ArrayQuantileT7(exprs(0), exprs(1)),
      "built-in")
    registry.createOrReplaceTempFunction(
      "simhash",
      exprs => SimHash(exprs(0), foldInt(exprs(1), "simhash(hashes, bits)")),
      "built-in")
    registry.createOrReplaceTempFunction(
      "scale_row",
      exprs => ScaleRow(exprs(0), exprs(1)),
      "built-in")
    registry.createOrReplaceTempFunction(
      "decimal_dot",
      exprs => DecimalDot(exprs(0), exprs(1)),
      "built-in")
    registry.createOrReplaceTempFunction(
      "topk_collect",
      exprs => new TopKCollect(exprs(0), exprs(1), exprs(2),
        foldInt(exprs(3), "topk_collect(ord, id, payload, k)")),
      "built-in")
  }

  private def foldInt(e: org.apache.spark.sql.catalyst.expressions.Expression, usage: String): Int = {
    require(e.foldable, s"literal expected: $usage")
    e.eval(org.apache.spark.sql.catalyst.InternalRow.empty) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(s"integer literal expected in $usage, got $other")
    }
  }
}
