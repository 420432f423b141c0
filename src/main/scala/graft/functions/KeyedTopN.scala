package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Presto's N-variant min_by/max_by (reference: presto-main/.../
  * aggregation/minmaxby/ — MaxByNAggregationFunction + TypedKeyValueHeap):
  * the values `x` associated with the n largest (smallest) keys `y`,
  * ordered by key desc (asc).
  *
  * Spark's builtin min_by/max_by is 2-arg only, and the builtin name
  * cannot be arity-overloaded from a session registry, so these are
  * registered as `min_by_n` / `max_by_n`. Bounded binary heap per
  * group — O(n) memory regardless of group size (a collect_list
  * rewrite would buffer entire 100 TB groups). Ties on the key break
  * by value (ascending for max, so both engines produce one order).
  *
  * Keys are cast to double (numeric ordering); values may be
  * long, double, or string.
  */
final class KeyedTopNBuffer(val n: Int, val wantLargest: Boolean) {
  // weakest-first ordering: for max keep the n largest keys, root =
  // smallest key (ties: larger value evicted first)
  private val cmp = new java.util.Comparator[(Double, Any)] {
    override def compare(a: (Double, Any), b: (Double, Any)): Int = {
      val k = java.lang.Double.compare(a._1, b._1)
      // only the KEY direction flips between min/max; key ties always
      // prefer the smaller value so both engines emit one order
      if (k != 0) { if (wantLargest) k else -k }
      else -compareValues(a._2, b._2)
    }
  }
  private def compareValues(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x, y) => x.toString.compareTo(y.toString)
  }
  private[functions] val heap =
    new java.util.PriorityQueue[(Double, Any)](math.max(1, n), cmp)

  def add(k: Double, v: Any): Unit = {
    if (heap.size < n) heap.add((k, v))
    else if (cmp.compare((k, v), heap.peek()) > 0) {
      heap.poll(); heap.add((k, v))
    }
  }

  def mergeFrom(other: KeyedTopNBuffer): Unit = {
    val it = other.heap.iterator()
    while (it.hasNext) { val (k, v) = it.next(); add(k, v) }
  }

  /** values ordered by key desc (max) / asc (min), ties by value asc. */
  def values: Array[Any] = {
    val arr = new Array[(Double, Any)](heap.size)
    val it = heap.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr, cmp.reversed())
    arr.map(_._2)
  }
}

case class KeyedTopNAgg(
    valueExpr: Expression,
    keyExpr: Expression,
    nExpr: Expression,
    wantLargest: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KeyedTopNBuffer] {

  private lazy val n: Int = nExpr.eval().asInstanceOf[Number].intValue()
  private lazy val keyAsDouble = Cast(keyExpr, DoubleType)
  // close the buffer over exactly three jvm types: long/double/string
  private lazy val valueNorm: Expression = valueExpr.dataType match {
    case ByteType | ShortType | IntegerType => Cast(valueExpr, LongType)
    case FloatType => Cast(valueExpr, DoubleType)
    case _ => valueExpr
  }

  override def children: Seq[Expression] = Seq(valueExpr, keyExpr, nExpr)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(valueNorm.dataType, containsNull = false)
  override def prettyName: String = if (wantLargest) "max_by_n" else "min_by_n"

  override def createAggregationBuffer(): KeyedTopNBuffer =
    new KeyedTopNBuffer(n, wantLargest)

  override def update(buf: KeyedTopNBuffer, input: InternalRow): KeyedTopNBuffer = {
    val k = keyAsDouble.eval(input)
    val v = valueNorm.eval(input)
    if (k != null && v != null) buf.add(k.asInstanceOf[Double], toJvm(v))
    buf
  }

  private def toJvm(v: Any): Any = v match {
    case s: UTF8String => s.toString
    case other => other
  }

  override def merge(buf: KeyedTopNBuffer, other: KeyedTopNBuffer): KeyedTopNBuffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: KeyedTopNBuffer): Any =
    new GenericArrayData(buf.values.map {
      case s: String => UTF8String.fromString(s)
      case other => other
    })

  override def serialize(buf: KeyedTopNBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.heap.size)
    val it = buf.heap.iterator()
    while (it.hasNext) {
      val (k, v) = it.next()
      out.writeDouble(k)
      v match {
        case l: Long => out.writeByte(0); out.writeLong(l)
        case d: Double => out.writeByte(1); out.writeDouble(d)
        case s: String => out.writeByte(2); out.writeUTF(s)
        case other => out.writeByte(2); out.writeUTF(other.toString)
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KeyedTopNBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KeyedTopNBuffer(n, wantLargest)
    val sz = in.readInt()
    var i = 0
    while (i < sz) {
      val k = in.readDouble()
      val v: Any = in.readByte() match {
        case 0 => in.readLong()
        case 1 => in.readDouble()
        case _ => in.readUTF()
      }
      buf.add(k, v)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KeyedTopNAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KeyedTopNAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KeyedTopNAgg =
    copy(valueExpr = newChildren(0), keyExpr = newChildren(1), nExpr = newChildren(2))
}
