package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** One-pass computation of TMM's per-row (log_ratio, abs_expr) arrays
  * (`feature_selection_and_normalization.py:96-112`) against a constant
  * pseudo-reference.
  *
  * Replaces an 8-layer chain of interpreted higher-order functions
  * (2 filters, 3 zip_withs, 3 transforms + per-row fold sums) with a single
  * tight loop — the chain allocated a Catalyst array per layer per row and
  * dominated TMM fit wall time. Arithmetic order matches the HOF
  * formulation exactly (sequential left-to-right sums, identical IEEE op
  * sequence), so fitted factors are unchanged.
  *
  * Returns `struct(lr: array<double>, ae: array<double>)`; elements are
  * null where pandas has missing values, NaN where it has NaN (±inf is
  * mapped to NaN per `:85-86`).
  */
case class TmmRatios(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = StructType(Seq(
    StructField("lr", ArrayType(DoubleType, containsNull = true)),
    StructField("ae", ArrayType(DoubleType, containsNull = true))))

  override def nullable: Boolean = true

  // pseudo-reference is a foldable literal: decode once
  @transient private lazy val ref: Array[Double] =
    right.eval(InternalRow.empty).asInstanceOf[ArrayData].toDoubleArray()

  private val LN2 = math.log(2.0)
  private def log2(x: Double): Double = math.log(x) / LN2
  private def nanIfInf(x: Double): Double = if (x.isInfinite) Double.NaN else x

  override def nullSafeEval(arrAny: Any, refAny: Any): Any = {
    val arr = arrAny.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n != ref.length) return null
    var i = 0
    while (i < n) { if (arr.isNullAt(i)) return null; i += 1 }
    val g = arr.toDoubleArray()

    // row scalars, sequential left-to-right (parity with the fold sums)
    var s = 0.0; var s2 = 0.0; var refS = 0.0
    i = 0
    while (i < n) {
      val gi = g(i); val ri = ref(i)
      if (gi > 0) s += gi
      val m = gi > 0 || ri > 0
      s2 += (if (m) gi else 0.0)
      refS += (if (m) ri else 0.0)
      i += 1
    }

    val lr = new Array[Any](n)
    val ae = new Array[Any](n)
    i = 0
    while (i < n) {
      val gi = g(i); val ri = ref(i)
      lr(i) = if (gi > 0) java.lang.Double.valueOf(nanIfInf((s - gi) / (s * gi))) else null
      ae(i) = if (gi > 0 && ri > 0) {
        val num = gi / s2
        val den = ri / refS
        val l2num = log2(if (num == 0.0) 1.0 else num)
        val l2denRaw = log2(if (den == 0.0) 1.0 else den)
        val l2den = if (l2denRaw == 0.0) 1.0 else l2denRaw
        java.lang.Double.valueOf(nanIfInf(l2num / l2den / 2.0))
      } else null
      i += 1
    }
    InternalRow(new GenericArrayData(lr), new GenericArrayData(ae))
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TmmRatios {
  def apply(features: Column, pseudoref: Array[Double]): Column =
    ExpressionUtils.column(TmmRatios(
      ExpressionUtils.expression(features),
      ExpressionUtils.expression(org.apache.spark.sql.functions.lit(pseudoref))))
}
