package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-N buffer: keeps the N largest (or smallest) doubles seen.
  *
  * Mirrors Presto's `max(x, n)` / `min(x, n)` aggregates
  * (reference: presto-main operator/aggregation/MinNAggregationFunction.java
  * + TypedHeap.java) as a Spark `TypedImperativeAggregate` — the same
  * mechanism Spark uses for its own sketches. The buffer is a bounded
  * binary heap, so memory per group is O(n) regardless of group size,
  * and merges are O(n log n) — safe for 100 TB group-bys where a
  * collect_list+slice rewrite would buffer entire groups.
  */
final class TopNBuffer(val n: Int, val wantLargest: Boolean) {
  // min-heap of the current top-N when wantLargest (root = weakest member)
  private[functions] val heap = new java.util.PriorityQueue[java.lang.Double](
    math.max(1, n),
    if (wantLargest) java.util.Comparator.naturalOrder[java.lang.Double]()
    else java.util.Comparator.reverseOrder[java.lang.Double]())

  def add(v: Double): Unit = {
    if (heap.size < n) heap.add(v)
    else {
      val root = heap.peek()
      val better = if (wantLargest) v > root else v < root
      if (better) { heap.poll(); heap.add(v) }
    }
  }

  def values: Array[Double] = {
    val arr = new Array[Double](heap.size)
    val it = heap.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    // Presto returns max(x,n) in descending, min(x,n) in ascending order.
    if (wantLargest) arr.sorted(Ordering[Double].reverse) else arr.sorted
  }
}

case class BoundedTopNAgg(
    child: Expression,
    nExpr: Expression,
    wantLargest: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopNBuffer] {

  private lazy val n: Int = nExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, nExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = if (wantLargest) "max_n" else "min_n"

  override def createAggregationBuffer(): TopNBuffer = new TopNBuffer(n, wantLargest)

  override def update(buf: TopNBuffer, input: InternalRow): TopNBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: TopNBuffer, other: TopNBuffer): TopNBuffer = {
    val it = other.heap.iterator()
    while (it.hasNext) buf.add(it.next())
    buf
  }

  override def eval(buf: TopNBuffer): Any = new GenericArrayData(buf.values)

  override def serialize(buf: TopNBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.heap.size)
    val it = buf.heap.iterator()
    while (it.hasNext) out.writeDouble(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopNBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopNBuffer(n, wantLargest)
    val sz = in.readInt()
    var i = 0
    while (i < sz) { buf.add(in.readDouble()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopNAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopNAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BoundedTopNAgg =
    copy(child = newChildren(0), nExpr = newChildren(1))
}
