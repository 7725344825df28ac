// Lives in the org.apache.spark.sql namespace on purpose: custom Catalyst
// expressions need private[sql] API (AbstractDataType in ExpectsInputTypes'
// signature, the classic Column↔Expression bridge) — the standard idiom for
// out-of-tree Spark extensions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}
import org.apache.spark.sql.classic.ExpressionUtils

/** TMM's per-row trimmed mean (`feature_selection_and_normalization.py:94`)
  * in one pass: mean of `ae(i)` over positions where both `lr(i)` and
  * `ae(i)` are non-null, non-NaN and strictly inside their trim windows.
  *
  * Replaces the composed `zip_with → filter → aggregate(struct(s,n))`
  * chain, which allocated three Catalyst arrays plus a struct accumulator
  * per element per row and dominated the TMM factor evaluation (the
  * geometric-mean job alone was ~4.4 s at sf0.1). Summation order is the
  * array order, identical to the sequential fold of the composed form, so
  * factors are bit-identical (parity spec in NormalizationSpec).
  */
case class TrimmedMean(left: Expression, right: Expression,
                       lrLo: Double, lrHi: Double, aeLo: Double, aeHi: Double)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  def compute(lr: ArrayData, ae: ArrayData): Any = {
    val n = math.min(lr.numElements(), ae.numElements())
    var s = 0.0
    var cnt = 0L
    var i = 0
    while (i < n) {
      if (!lr.isNullAt(i) && !ae.isNullAt(i)) {
        val l = lr.getDouble(i)
        val a = ae.getDouble(i)
        if (!l.isNaN && l > lrLo && l < lrHi && !a.isNaN && a > aeLo && a < aeHi) {
          s += a
          cnt += 1
        }
      }
      i += 1
    }
    if (cnt > 0) java.lang.Double.valueOf(s / cnt.toDouble) else null
  }

  override def nullSafeEval(lrAny: Any, aeAny: Any): Any =
    compute(lrAny.asInstanceOf[ArrayData], aeAny.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("trimmedMean", this, classOf[TrimmedMean].getName)
    nullSafeCodeGen(ctx, ev, (lr, ae) => {
      val res = ctx.freshName("res")
      s"""
         |final Object $res = $self.compute($lr, $ae);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((Double) $res).doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TrimmedMean {
  /** Column API entry point (Spark 4 classic bridge). */
  def apply(lr: Column, ae: Column, lrLo: Double, lrHi: Double,
            aeLo: Double, aeHi: Double): Column =
    ExpressionUtils.column(TrimmedMean(
      ExpressionUtils.expression(lr), ExpressionUtils.expression(ae),
      lrLo, lrHi, aeLo, aeHi))
}
