package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** approx_most_frequent(buckets, value, capacity) — Presto's heavy-hitters
  * aggregate (reference: presto-main/.../aggregation/
  * ApproximateMostFrequentFunction.java), returning the top `buckets`
  * values with approximate counts as a map.
  *
  * Backed by the DataSketches frequent-items sketch (Misra-Gries
  * family): O(capacity) memory per group regardless of group size,
  * associative lossless merge for partial/final aggregation, and —
  * the property the oracle exploits — counts are EXACT whenever the
  * distinct-value count stays under the sketch's maximum map size.
  */
case class ApproxMostFrequentAgg(
    bucketsExpr: Expression,
    child: Expression,
    capacityExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] {

  private lazy val buckets: Int = bucketsExpr.eval().asInstanceOf[Number].intValue()
  // ItemsSketch needs a power-of-2 max map size ≥ capacity
  private lazy val sketchSize: Int = {
    val cap = capacityExpr.eval().asInstanceOf[Number].intValue()
    var p = 8
    while (p < cap) p <<= 1
    p
  }
  // not java-serializable; rebuilt per task after closure transport
  @transient private lazy val serde = new ArrayOfStringsSerDe()

  override def children: Seq[Expression] = Seq(bucketsExpr, child, capacityExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "approx_most_frequent"

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](sketchSize)

  override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(v.toString)
    buf
  }

  override def merge(buf: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] = {
    buf.merge(other)
    buf
  }

  override def eval(buf: ItemsSketch[String]): Any = {
    // NO_FALSE_NEGATIVES lists every candidate; sort by estimate desc
    // then value for a deterministic top-`buckets` cut
    val rows = buf.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .toSeq
      .map(r => (r.getItem, r.getEstimate))
      .sortBy { case (item, est) => (-est, item) }
      .take(buckets)
    ArrayBasedMapData(
      rows.map(r => UTF8String.fromString(r._1)).toArray,
      rows.map(_._2).toArray)
  }

  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(serde)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  override def withNewMutableAggBufferOffset(newOffset: Int): ApproxMostFrequentAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ApproxMostFrequentAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ApproxMostFrequentAgg =
    copy(bucketsExpr = newChildren(0), child = newChildren(1), capacityExpr = newChildren(2))
}
