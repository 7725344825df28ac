// Lives in the org.apache.spark.sql namespace on purpose: custom Catalyst
// expressions need private[sql] API (AbstractDataType in ExpectsInputTypes'
// signature, the classic Column↔Expression bridge) — the standard idiom for
// out-of-tree Spark extensions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}
import org.apache.spark.sql.classic.ExpressionUtils

/** All k MinHash values of a shingle-hash array in ONE pass.
  *
  * Replaces k parallel `array_min(transform(hs, h => pmod(a_j*pmod(h,P)+b_j,
  * P)))` projections. That composed form embeds the `hs` expression tree — a
  * per-shingle md5 hash chain — k times in one projection, and Spark performs
  * no common-subexpression elimination inside interpreted higher-order
  * functions, so every shingle's md5 was evaluated k (=16) times; measured as
  * 48% of the round-1 bench (86.65 s for q31 at sf0.1). Here the hash array
  * is a single child evaluated once, and the k mins fall out of one tight
  * loop with no per-hash-function array allocation.
  *
  * Value parity with the composed form (and the DuckDB oracle replay in
  * `DedupPack.bandSqlCtes`): `min_j = MIN over h of (a_j * (h mod P) + b_j)
  * mod P`, all operands non-negative, products < 2^62 (a_j, h mod P < P =
  * 2^31−1) so 64-bit arithmetic never overflows. Null elements are skipped
  * (as `array_min` does); a null or empty/all-null array yields null.
  *
  * Codegen: participates in whole-stage codegen via a reference-object call
  * into [[compute]] — one virtual call per row, loop runs as JVM-compiled
  * Scala either way.
  */
case class MinHashSketch(child: Expression, prime: Long, as: Seq[Long], bs: Seq[Long])
  extends UnaryExpression with ImplicitCastInputTypes {

  require(as.nonEmpty && as.length == bs.length, "need k = |as| = |bs| > 0 hash functions")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val aArr: Array[Long] = as.toArray
  @transient private lazy val bArr: Array[Long] = bs.toArray

  /** One pass over the hash array computing all k mins; null if no
    * non-null element (parity with `array_min` of an empty array). */
  def compute(arr: ArrayData): Array[Long] = {
    val n = arr.numElements()
    val k = aArr.length
    val mins = Array.fill(k)(Long.MaxValue)
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen = true
        var h = arr.getLong(i) % prime
        if (h < 0) h += prime
        var j = 0
        while (j < k) {
          val v = (aArr(j) * h + bArr(j)) % prime
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (seen) mins else null
  }

  override def nullSafeEval(input: Any): Any = {
    val mins = compute(input.asInstanceOf[ArrayData])
    if (mins == null) null else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minHashSketch", this, classOf[MinHashSketch].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      val mins = ctx.freshName("mins")
      s"""
         |final long[] $mins = $self.compute($arr);
         |if ($mins == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSketch {
  /** Column API entry point (Spark 4 classic bridge). */
  def apply(hashes: Column, prime: Long, as: Seq[Long], bs: Seq[Long]): Column =
    ExpressionUtils.column(MinHashSketch(ExpressionUtils.expression(hashes), prime, as, bs))
}
