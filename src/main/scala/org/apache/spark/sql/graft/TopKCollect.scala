// Lives in the org.apache.spark.sql namespace on purpose: custom Catalyst
// expressions need private[sql] API — the standard idiom for out-of-tree
// Spark extensions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Bounded top-k state: a max-heap holding the k SMALLEST entries seen —
  * constant-size, mergeable, serializable. Ordered by the FULL
  * `(ord, id, payload)` tuple so the result is deterministic even when
  * callers pass duplicate `(ord, id)` keys with differing payloads
  * (entries equal on all three are interchangeable): partition and merge
  * order can never pick a different survivor. */
final class TopKBuffer(val k: Int) {
  val heap: scala.collection.mutable.PriorityQueue[(Long, Long, Long)] =
    scala.collection.mutable.PriorityQueue.empty(Ordering[(Long, Long, Long)])
  def insert(ord: Long, id: Long, payload: Long): Unit =
    if (heap.size < k) heap.enqueue((ord, id, payload))
    else if (Ordering[(Long, Long, Long)].lt((ord, id, payload), heap.head)) {
      heap.dequeue(); heap.enqueue((ord, id, payload))
    }
}

/** Grouped top-k as a mergeable AGGREGATE (`TypedImperativeAggregate`):
  * per group, collect the k smallest `(ord, id)` entries with a carried
  * payload, returned sorted as `array<struct<ord,id,payload>>`.
  *
  * This is the scale-correct shape for per-key caps/top-k (the reference's
  * per-source document cap, SURVEY §2 O1/q82 family): the window
  * formulation (`row_number() OVER (PARTITION BY key ORDER BY ord)`)
  * shuffles EVERY row to its key's partition and sorts it, while this
  * aggregate gets partial aggregation for free — each map task reduces its
  * slice to a k-sized heap per key, the shuffle carries only k-row states,
  * and merge is heap-union. At 100 TB with a cap of 30, that is the
  * difference between shuffling the corpus and shuffling |keys|·k rows.
  * Determinism: total order on the full (ord, id, payload) tuple, so the
  * kept set never depends on partitioning — even under duplicate
  * (ord, id) keys (the q82 hash-order contract and then some).
  */
case class TopKCollect(ord: Expression, id: Expression, payload: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with ImplicitCastInputTypes {

  require(k > 0, "topk_collect: k must be positive")

  override def children: Seq[Expression] = Seq(ord, id, payload)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType, LongType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", LongType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("payload", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val o = ord.eval(input)
    val i = id.eval(input)
    if (o != null && i != null) {
      val p = payload.eval(input)
      b.insert(o.asInstanceOf[Long], i.asInstanceOf[Long],
        if (p == null) 0L else p.asInstanceOf[Long])
    }
    b
  }

  override def merge(b: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.heap.foreach(t => b.insert(t._1, t._2, t._3))
    b
  }

  override def eval(b: TopKBuffer): Any = {
    val sorted = b.heap.toArray.sorted
    new GenericArrayData(sorted.map(t => InternalRow(t._1, t._2, t._3)))
  }

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(b.k)
    out.writeInt(b.heap.size)
    b.heap.foreach { t => out.writeLong(t._1); out.writeLong(t._2); out.writeLong(t._3) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(in.readInt())
    var n = in.readInt()
    while (n > 0) { buf.insert(in.readLong(), in.readLong(), in.readLong()); n -= 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKCollect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKCollect =
    copy(ord = newChildren(0), id = newChildren(1), payload = newChildren(2))
  override def prettyName: String = "topk_collect"
}

object TopKCollect {
  /** Column-API bridge: `topk(ord, id, payload, k)` as an aggregate column. */
  def apply(ord: Column, id: Column, payload: Column, k: Int): Column =
    ExpressionUtils.column(new TopKCollect(
      ExpressionUtils.expression(ord), ExpressionUtils.expression(id),
      ExpressionUtils.expression(payload), k).toAggregateExpression())
}
