// Lives in the org.apache.spark.sql namespace on purpose: custom Catalyst
// expressions need private[sql] API (the Column↔Expression bridge) — the
// standard idiom for out-of-tree Spark extensions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, LongType}
import org.apache.spark.sql.classic.ExpressionUtils

/** Deterministic Bloom-filter membership probe over a long key, as a
  * whole-stage-codegen scalar expression — the map-side prefilter that lets
  * a membership set too big to broadcast as a hash relation still prune a
  * 100 TB scan (a Bloom filter spends ~`k·ln2 ≈ 10` bits per element at 1%
  * false positives vs ≥64 for the raw hash set, so the broadcast stays
  * executor-memory-friendly at 10–50× larger benchmark/blocklist sizes).
  *
  * False positives are possible by construction, false negatives are not —
  * callers follow the probe with an exact confirm join over the (now tiny)
  * surviving stream, so query RESULTS are bloom-independent and stay
  * oracle-exact; the bloom only changes where the work happens (map-side
  * drop vs shuffle). See ScaleOpsPack q126.
  *
  * Double hashing (Kirsch–Mitzenmacher): probe i uses `h1 + i·h2` with h1 =
  * the key itself (already an md5-derived 32-bit content hash — see
  * [[graft.text.TextOps.hash32]]) and h2 an odd multiplicative mix, so k
  * probes cost two multiplies, not k hash evaluations. Fully deterministic:
  * same inputs → same bits on any engine, any partitioning.
  */
object Bloom {

  /** Number of probe functions (k = 7 ≈ optimal for ~10 bits/element). */
  val K = 7

  /** Bit-set size (in 64-bit words) for n elements: next power of two
    * ≥ 16·n bits (≈ 0.2–1% FPR at k=7). Shared by both build paths so the
    * driver-side and distributed builds are bit-identical. */
  private def wordsFor(n: Long): Int = {
    val nBits = java.lang.Long.highestOneBit(math.max(n * 16, 64) * 2 - 1)
    (nBits >> 6).toInt
  }

  /** Driver-side build over an in-memory key set — for small sets and for
    * spec-level parity checks against [[buildDistributed]]. */
  def build(keys: Array[Long]): Array[Long] = {
    val words = new Array[Long](wordsFor(keys.length.toLong))
    var i = 0
    while (i < keys.length) {
      set(words, keys(i)); i += 1
    }
    words
  }

  /** Distributed build: per-partition partial blooms OR-merged through a
    * depth-2 `treeAggregate`, so driver memory is O(bloom bits), NOT O(key
    * set) — the key set itself is never collected. `n` is the (pre-counted)
    * element count that sizes the bit array; callers persist the key frame
    * and `count()` it first, so sizing and building are two jobs over one
    * materialization (the SURVEY §1.3 two-job pattern). Because set-bit
    * positions depend only on the key and the array length, the result is
    * bit-identical to `build(keys.collect())` regardless of partitioning —
    * OR is commutative/associative and duplicate sets are idempotent
    * (BloomSpec asserts the parity). */
  def buildDistributed(keys: org.apache.spark.rdd.RDD[Long], n: Long): Array[Long] = {
    val nWords = wordsFor(n)
    keys.treeAggregate(new Array[Long](nWords))(
      seqOp = (w, k) => { set(w, k); w },
      combOp = (a, b) => {
        var i = 0
        while (i < a.length) { a(i) |= b(i); i += 1 }
        a
      },
      depth = 2)
  }

  /** 64-bit finalizer (murmur3 fmix64): probe positions must be uniform
    * even for STRUCTURED keys (sequential ids, 32-bit content hashes whose
    * top half is zero) — `h1 = key` raw would alias such keys into a tiny
    * slice of the bit space and blow up the FPR. */
  private def mix(z0: Long): Long = {
    var z = z0
    z ^= z >>> 33; z *= 0xFF51AFD7ED558CCDL
    z ^= z >>> 33; z *= 0xC4CEB9FE1A85EC53L
    z ^ (z >>> 33)
  }

  private def set(words: Array[Long], key: Long): Unit = {
    val mask = (words.length.toLong << 6) - 1
    val h1 = mix(key)
    val step = mix(key ^ 0x9E3779B97F4A7C15L) | 1L
    var i = 0
    while (i < K) {
      val bit = (h1 + i * step) & mask
      words((bit >> 6).toInt) |= 1L << (bit & 63)
      i += 1
    }
  }

  /** Public single-key insert — the per-group seqOp for keyed builds that
    * need MANY independent blooms in one pass (per-file bloom manifests,
    * [[graft.io.FileSkipping.buildBloomManifest]]), where the one-set
    * [[build]]/[[buildDistributed]] entry points don't fit. Same bit
    * positions as both, so parity properties carry over unchanged. */
  def add(words: Array[Long], key: Long): Unit = set(words, key)

  def mightContain(words: Array[Long], key: Long): Boolean = {
    val mask = (words.length.toLong << 6) - 1
    val h1 = mix(key)
    val step = mix(key ^ 0x9E3779B97F4A7C15L) | 1L
    var i = 0
    while (i < K) {
      val bit = (h1 + i * step) & mask
      if ((words((bit >> 6).toInt) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Column API: `probe(bits)(keyCol)`. */
  def probe(words: Array[Long])(key: Column): Column =
    ExpressionUtils.column(BloomMightContain(ExpressionUtils.expression(key), words))
}

/** See [[Bloom]]. The bit array rides along as a referenced object (same
  * mechanism broadcast hash relations use inside generated code). */
case class BloomMightContain(child: Expression, words: Array[Long])
  extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  def compute(key: Long): Boolean = Bloom.mightContain(words, key)

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bloomProbe", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, key => s"${ev.value} = $self.compute($key);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // The words array is payload, not an equality-relevant child.
  override def equals(other: Any): Boolean = other match {
    case BloomMightContain(c, w) => c == child && (w sameElements words)
    case _ => false
  }
  override def hashCode(): Int = child.hashCode() * 31 + words.length
}
