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

/** Plain IEEE-754 dot product of two double arrays in one pass — the
  * PRODUCTION fast path beside [[DecimalDot]].
  *
  * [[DecimalDot]] exists for cross-engine ORACLE parity: it quantizes every
  * elementwise product to decimal scale 10 so Spark and DuckDB sum
  * identical values in any order. That exactness costs a BigDecimal
  * allocation per element (~50× a fused multiply-add), which is the right
  * trade for oracle-gated queries and the wrong one for a 100 TB ANN index
  * build where no oracle exists and left-to-right double summation is
  * deterministic for a fixed array layout anyway. Same null semantics as
  * [[DecimalDot]]: null array, length mismatch, or any null element →
  * null. Agreement with the decimal path is spec-bounded (|Δ| relative
  * ≤ 1e-8 on unit-scale embeddings, DedupTextSpec).
  */
case class DoubleDot(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  def compute(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override def nullSafeEval(aAny: Any, bAny: Any): Any =
    compute(aAny.asInstanceOf[ArrayData], bAny.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("doubleDot", this, classOf[DoubleDot].getName)
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

object DoubleDot {
  /** Column API entry point (Spark 4 classic bridge). */
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(DoubleDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
