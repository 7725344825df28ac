// Lives in the org.apache.spark.sql namespace on purpose: custom Catalyst
// expressions need private[sql] API (AbstractDataType in ExpectsInputTypes'
// signature, the classic Column↔Expression bridge) — the standard idiom for
// out-of-tree Spark extensions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}
import org.apache.spark.sql.classic.ExpressionUtils

/** Multiply every element of a double array by a per-row scalar, with BOTH
  * children evaluated exactly once per row.
  *
  * The composed form `transform(arr, x => x * factor)` embeds the `factor`
  * expression inside the lambda body, and Spark evaluates lambda bodies per
  * ELEMENT — when `factor` is itself a per-row reduction (UQ's
  * `rowQuantile(arr)/rowSum(arr)` normalization factor) the cost turns
  * O(width²) per row. Invisible at width 4–64; at the 40k-gene width of the
  * scaling bench one cell ran 35+ minutes before this node replaced it.
  * A plain BinaryExpression evaluates each child once, so the factor tree
  * is computed once per row no matter what CollapseProject inlines into it.
  *
  * Null semantics match the lambda form: null array → null; null factor or
  * null element → null element.
  */
case class ScaleRow(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType), DoubleType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = left.nullable

  // not nullSafeEval: a null factor must yield an array of null elements
  // (the lambda form's behavior), not a null array
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val arrAny = left.eval(input)
    if (arrAny == null) return null
    val arr = arrAny.asInstanceOf[ArrayData]
    val factorAny = right.eval(input)
    val n = arr.numElements()
    val out = new Array[Any](n)
    if (factorAny != null) {
      val f = factorAny.asInstanceOf[Double]
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) out(i) = java.lang.Double.valueOf(arr.getDouble(i) * f)
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ScaleRow {
  /** Column API entry point (Spark 4 classic bridge). */
  def apply(arr: Column, factor: Column): Column =
    ExpressionUtils.column(ScaleRow(
      ExpressionUtils.expression(arr), ExpressionUtils.expression(factor)))
}
