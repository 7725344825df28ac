package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}

/** SQL registration for graft's custom Catalyst expressions, so
  * `spark.sql("SELECT array_quantile_t7(arr, 0.75) ...")` works alongside
  * the Column API. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[ClassicSession].sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "array_quantile_t7",
      exprs => ArrayQuantileT7(exprs(0), exprs(1)),
      "built-in")
  }
}
