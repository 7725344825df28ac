// Lives in the org.apache.spark.sql namespace on purpose: custom Catalyst
// expressions need private[sql] API (AbstractDataType in ExpectsInputTypes'
// signature, the classic Column↔Expression bridge) — the standard idiom for
// out-of-tree Spark extensions.
package org.apache.spark.sql.graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}
import org.apache.spark.sql.classic.ExpressionUtils

/** Exact-decimal dot product of two double arrays in ONE pass.
  *
  * Same value contract as the composed form (`aggregate(zip_with(a, b,
  * (x,y) => (x*y).cast(decimal(20,10))), 0, +)` cast back to double):
  * every elementwise product is quantized to scale 10 with HALF_UP via the
  * double's shortest decimal representation (`BigDecimal.valueOf`, the
  * same path Spark's double→decimal cast takes), summed exactly, and the
  * final decimal is correctly rounded back to double. Order-independent
  * and bit-identical to the DuckDB oracle's
  * `CAST(SUM(CAST(x*y AS DECIMAL(38,10))) AS DOUBLE)`.
  *
  * The composed form allocated a zipped Catalyst array plus a Decimal per
  * fold step per row, interpreted; it dominated the similarity-search
  * queries (8-plane bucketing = 8 such chains per row). Here the loop does
  * one BigDecimal add per element with no Catalyst interpretation.
  *
  * Null semantics match the composed form: null array, length mismatch, or
  * any null element in either array → null (zip_with pads the shorter side
  * with null and a null product nulls the fold).
  */
case class DecimalDot(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  def compute(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = JBigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc = acc.add(
        JBigDecimal.valueOf(a.getDouble(i) * b.getDouble(i)).setScale(10, RoundingMode.HALF_UP))
      i += 1
    }
    java.lang.Double.valueOf(acc.doubleValue())
  }

  override def nullSafeEval(aAny: Any, bAny: Any): Any =
    compute(aAny.asInstanceOf[ArrayData], bAny.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("decimalDot", this, classOf[DecimalDot].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("res")
      s"""
         |final Object $res = $self.compute($a, $b);
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

object DecimalDot {
  /** Column API entry point (Spark 4 classic bridge). */
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(DecimalDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
