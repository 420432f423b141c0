package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._

/** `histogram(x)` → map<x, bigint> and `multimap_agg(k, v)` →
  * map<k, array<v>> as callable aggregates (reference:
  * operator/aggregation/histogram/ and MultimapAggregationFunction
  * .java — both previously covered only as groupBy rewrites in the
  * query layer). The buffer is a LinkedHashMap of Catalyst internal
  * values (UTF8String is Externalizable; numeric internals are plain
  * serializable), so one generic implementation covers the practical
  * key/value types. Memory per group is O(distinct keys), the same
  * contract as the reference's GroupedTypedHistogram.
  */
final class KeyedMapBuffer {
  private[functions] val entries =
    new java.util.LinkedHashMap[Any, java.util.ArrayList[Any]]()

  def add(k: Any, v: Any): Unit = {
    var lst = entries.get(k)
    if (lst == null) { lst = new java.util.ArrayList[Any](); entries.put(k, lst) }
    lst.add(v)
  }

  def mergeWith(other: KeyedMapBuffer): Unit = {
    val it = other.entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val vi = e.getValue.iterator()
      while (vi.hasNext) add(e.getKey, vi.next())
    }
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new ObjectOutputStream(bos)
    out.writeObject(entries)
    out.flush()
    bos.toByteArray
  }
}

object KeyedMapBuffer {
  def deserialize(bytes: Array[Byte]): KeyedMapBuffer = {
    val in = new ObjectInputStream(new ByteArrayInputStream(bytes))
    val buf = new KeyedMapBuffer()
    val m = in.readObject().asInstanceOf[java.util.LinkedHashMap[Any, java.util.ArrayList[Any]]]
    buf.entries.putAll(m)
    buf
  }
}

abstract class KeyedMapAggBase extends TypedImperativeAggregate[KeyedMapBuffer] {
  override def nullable: Boolean = false
  override def createAggregationBuffer(): KeyedMapBuffer = new KeyedMapBuffer()
  override def merge(buf: KeyedMapBuffer, other: KeyedMapBuffer): KeyedMapBuffer = {
    buf.mergeWith(other); buf
  }
  override def serialize(buf: KeyedMapBuffer): Array[Byte] = buf.serialize()
  override def deserialize(b: Array[Byte]): KeyedMapBuffer =
    KeyedMapBuffer.deserialize(b)
}

case class HistogramAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KeyedMapAggBase {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType =
    MapType(child.dataType, LongType, valueContainsNull = false)
  override def prettyName: String = "histogram"

  override def update(buf: KeyedMapBuffer, input: InternalRow): KeyedMapBuffer = {
    val v = child.eval(input)
    // eval results for non-primitive types (UTF8String, arrays,
    // structs) alias the reused input-row buffer — copy before
    // storing, as Spark's own Collect aggregates do
    if (v != null) buf.add(InternalRow.copyValue(v), java.lang.Boolean.TRUE)
    buf
  }

  override def eval(buf: KeyedMapBuffer): Any = {
    val n = buf.entries.size()
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    val it = buf.entries.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      keys(i) = e.getKey
      vals(i) = e.getValue.size().toLong
      i += 1
    }
    ArrayBasedMapData(keys, vals)
  }

  override def withNewMutableAggBufferOffset(o: Int): HistogramAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HistogramAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HistogramAgg =
    copy(child = c(0))
}

case class MultimapAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KeyedMapAggBase {

  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType =
    MapType(left.dataType, ArrayType(right.dataType), valueContainsNull = false)
  override def prettyName: String = "multimap_agg"

  override def update(buf: KeyedMapBuffer, input: InternalRow): KeyedMapBuffer = {
    val k = left.eval(input)
    // copy both sides: buffer-backed values are mutated by the next row
    if (k != null)
      buf.add(InternalRow.copyValue(k),
        InternalRow.copyValue(right.eval(input)))
    buf
  }

  override def eval(buf: KeyedMapBuffer): Any = {
    val n = buf.entries.size()
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    val it = buf.entries.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      keys(i) = e.getKey
      vals(i) = new GenericArrayData(e.getValue.toArray)
      i += 1
    }
    ArrayBasedMapData(keys, vals)
  }

  override def withNewMutableAggBufferOffset(o: Int): MultimapAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MultimapAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MultimapAgg =
    copy(left = c(0), right = c(1))
}
