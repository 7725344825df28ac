// Lives in the org.apache.spark.sql namespace on purpose: custom Catalyst
// expressions need private[sql] API (AbstractDataType in ExpectsInputTypes'
// signature, the classic Column↔Expression bridge) — the standard idiom for
// out-of-tree Spark extensions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, ByteType, DataType, DoubleType}
import org.apache.spark.sql.classic.ExpressionUtils

/** Fused dot product of a double array with an int8 CODE array in one
  * pass — the scan kernel of the quantized-IVF probe ([[graft.similarity
  * .Similarity.probeQuantizedIvf]], fast path).
  *
  * The asymmetric score against per-dim affine codes decomposes as
  * `dot(q, dequant(c)) = qconst + Σ t[i]·c[i]` with `t[i] = q[i]·sc[i]/255`
  * and `qconst = dot(q, lo) + 128·Σ t[i]` both precomputed ONCE per query
  * (FAISS's SQ8 scan identity): scoring a code row is then one fused
  * multiply-add per dimension over tinyints — no dequantized array is ever
  * materialized, and the scan reads 1/8 the bytes of an `array<double>`
  * index. Null semantics match [[DoubleDot]]: null array, length mismatch,
  * or null element → null.
  */
case class Int8Dot(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(ByteType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  def compute(a: ArrayData, c: ArrayData): Any = {
    val n = a.numElements()
    if (c.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || c.isNullAt(i)) return null
      acc += a.getDouble(i) * c.getByte(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override def nullSafeEval(aAny: Any, cAny: Any): Any =
    compute(aAny.asInstanceOf[ArrayData], cAny.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("int8Dot", this, classOf[Int8Dot].getName)
    nullSafeCodeGen(ctx, ev, (a, c) => {
      val res = ctx.freshName("res")
      s"""
         |final Object $res = $self.compute($a, $c);
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

object Int8Dot {
  /** Column API entry point (Spark 4 classic bridge). */
  def apply(a: Column, c: Column): Column =
    ExpressionUtils.column(Int8Dot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(c)))
}
