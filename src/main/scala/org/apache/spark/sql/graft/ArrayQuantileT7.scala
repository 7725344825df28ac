// Lives in the org.apache.spark.sql namespace on purpose: custom Catalyst
// expressions need private[sql] API (AbstractDataType in ExpectsInputTypes'
// signature, the classic Column↔Expression bridge) — the standard idiom for
// out-of-tree Spark extensions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}
import org.apache.spark.sql.classic.ExpressionUtils

/** Native exact type-7 (linear interpolation, numpy default) quantile over
  * an ArrayType(Double) row — SURVEY §7.3's "custom Expression only if
  * profiling demands": the composed `array_sort` + `element_at` form
  * allocates a Catalyst array copy per access and stays interpreted; this
  * node sorts one primitive `double[]` and interpolates, with full
  * whole-stage codegen when used outside lambdas.
  *
  * Value parity: bit-identical to the composition
  * (`ArrayOps.rowQuantileComposed`) — same sort order (NaN last, as
  * java.util.Arrays.sort and Spark's double ordering agree) and the same
  * IEEE op sequence `a[lo] + (a[hi]-a[lo]) * (pos-lo)` with
  * `pos = (n-1)*q` — property-tested against the composed form.
  *
  * Semantics: null array / empty array / null element → null (the
  * reference's pandas `quantile` has no null rows by this point;
  * A4 site `feature_selection_and_normalization.py:27-28`).
  */
case class ArrayQuantileT7(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType), DoubleType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  @transient private lazy val elementsNullable =
    left.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(arrAny: Any, qAny: Any): Any = {
    val arr = arrAny.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    if (elementsNullable) {
      var i = 0
      while (i < n) { if (arr.isNullAt(i)) return null; i += 1 }
    }
    val a = arr.toDoubleArray()
    java.util.Arrays.sort(a)
    interp(a, qAny.asInstanceOf[Double])
  }

  private def interp(sorted: Array[Double], q: Double): Double = {
    val pos = (sorted.length - 1).toDouble * q
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    sorted(lo) + (sorted(hi) - sorted(lo)) * (pos - lo.toDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (arr, q) => {
      val n = ctx.freshName("n")
      val a = ctx.freshName("a")
      val pos = ctx.freshName("pos")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val i = ctx.freshName("i")
      val nullCheck = if (elementsNullable) {
        s"""for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
           |  if ($arr.isNullAt($i)) { ${ev.isNull} = true; }
           |}""".stripMargin
      } else ""
      s"""
         |final int $n = $arr.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  $nullCheck
         |  if (!${ev.isNull}) {
         |    final double[] $a = $arr.toDoubleArray();
         |    java.util.Arrays.sort($a);
         |    final double $pos = ($n - 1) * (double) $q;
         |    final int $lo = (int) Math.floor($pos);
         |    final int $hi = (int) Math.ceil($pos);
         |    ${ev.value} = $a[$lo] + ($a[$hi] - $a[$lo]) * ($pos - (double) $lo);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayQuantileT7 {
  /** Column API entry point (Spark 4 classic bridge). */
  def apply(arr: Column, q: Double): Column =
    ExpressionUtils.column(ArrayQuantileT7(
      ExpressionUtils.expression(arr),
      ExpressionUtils.expression(org.apache.spark.sql.functions.lit(q))))
}
