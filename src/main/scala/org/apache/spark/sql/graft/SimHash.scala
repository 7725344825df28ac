// Lives in the org.apache.spark.sql namespace on purpose: custom Catalyst
// expressions need private[sql] API (AbstractDataType in ExpectsInputTypes'
// signature, the classic Column↔Expression bridge) — the standard idiom for
// out-of-tree Spark extensions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}
import org.apache.spark.sql.classic.ExpressionUtils

/** `bits`-bit SimHash of a token-hash array in ONE pass.
  *
  * Replaces the composed form — a sum of `bits` independent
  * `aggregate(tokenHashes, ...)` folds — which embeds the token-hash child
  * (a per-token md5 hash chain) `bits` (=32) times in one projection; Spark
  * performs no CSE inside interpreted higher-order functions, so every
  * token's md5 was evaluated 32 times (measured 6.8 s for q32 at sf0.1 once
  * the bench stopped letting Catalyst prune the column).
  *
  * Value parity with the composed form and the DuckDB oracle: bit β of the
  * signature is set iff Σ_tokens (±1 by bit β of the token hash) > 0. A null
  * token hash votes −1 on every bit (`when(null ≠ 0, 1).otherwise(-1)`
  * takes the otherwise branch — no null tokens exist in practice); an empty
  * array yields signature 0 (every vote sums to 0).
  */
case class SimHash(child: Expression, bits: Int)
  extends UnaryExpression with ImplicitCastInputTypes {

  require(bits >= 1 && bits <= 63, "bits must be in [1, 63]")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](bits)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        var b = 0
        while (b < bits) { votes(b) -= 1; b += 1 }
      } else {
        val h = arr.getLong(i)
        var b = 0
        while (b < bits) {
          if ((h & (1L << b)) != 0L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) { if (votes(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("simHash", this, classOf[SimHash].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $self.compute($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash {
  /** Column API entry point (Spark 4 classic bridge). */
  def apply(tokenHashes: Column, bits: Int): Column =
    ExpressionUtils.column(SimHash(ExpressionUtils.expression(tokenHashes), bits))
}
