package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `min_k_longs(col BIGINT, k) -> ARRAY<BIGINT>` — the k smallest values
  * per group, ascending, as a native Catalyst TypedImperativeAggregate
  * (the aggregate rung of SURVEY par 4.3's custom-operator ladder; the
  * scalar rung is [[ExtractText]]).
  *
  * Why an aggregate and not a window: bounded top-k per group via
  * `row_number` windows must SORT each group's rows (and a hot group's
  * whole posting stream lands in one task unless salted, the t26
  * pattern); `collect_list` + slice holds the UNBOUNDED group in memory.
  * This aggregate holds a k-element max-heap per group, participates in
  * PARTIAL aggregation (each map task combines its rows into one k-heap
  * before the shuffle — ObjectHashAggregate partial/final), and merging
  * is order-independent, so the result is deterministic under any
  * partitioning. State per group is O(k) regardless of group size: a
  * stopword's 10^12 postings cost one k-heap per task, and the shuffle
  * carries one serialized heap per (task, group).
  */
case class MinKLongs(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[java.lang.Long]]
  with ImplicitCastInputTypes {

  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  // narrower integrals coerce to BIGINT at analysis; a non-numeric child
  // fails at plan build instead of a mid-task ClassCastException
  override def inputTypes: Seq[DataType] = Seq(LongType) // covariant: AbstractDataType is private[sql]
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "min_k_longs"

  // max-heap: peek() is the LARGEST of the k smallest seen so far
  override def createAggregationBuffer(): java.util.PriorityQueue[java.lang.Long] =
    new java.util.PriorityQueue[java.lang.Long](
      k + 1, java.util.Collections.reverseOrder[java.lang.Long]())

  private def add(buf: java.util.PriorityQueue[java.lang.Long], v: Long): Unit =
    if (buf.size < k) buf.add(v)
    else if (v < buf.peek()) { buf.poll(); buf.add(v) }

  override def update(buf: java.util.PriorityQueue[java.lang.Long],
      input: InternalRow): java.util.PriorityQueue[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: java.util.PriorityQueue[java.lang.Long],
      b: java.util.PriorityQueue[java.lang.Long]): java.util.PriorityQueue[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  override def eval(buf: java.util.PriorityQueue[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.PriorityQueue[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + 8 * buf.size)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[java.lang.Long] = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { add(buf, in.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinKLongs = copy(child = newChildren.head)
}
