package graft.functions

import org.apache.datasketches.hll.{HllSketch, Union => HllUnion}
import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Presto's polymorphic `merge(sketch)` aggregate
  * (MergeHyperLogLogAggregation / QuantileDigestAggregationFunction /
  * MergeSetDigestAggregation — the analyzer there dispatches on the
  * sketch TYPE). All graft sketches travel as BinaryType, so dispatch
  * happens on the serialized header instead: DataSketches writes its
  * family id at byte 2 (HLL = 7, KLL = 15), and graft's set digest
  * version header puts 0 there — the three families are disjoint at
  * that byte. The dedicated names (`merge_qdigest`, `merge_set_digest`,
  * Spark's `hll_union_agg`) remain for explicit use.
  */
final class MergeSketchBuffer {
  var family: Int = -1
  var set: SetDigestBuffer = _
  var kll: KllDoublesSketch = _
  var hll: HllUnion = _

  private def checkFamily(fam: Int): Unit =
    if (family != -1 && family != fam)
      throw new IllegalArgumentException(
        s"merge: mixed sketch families in one aggregation ($family vs $fam) — " +
          "each merge() call must see a single sketch type, as in the reference")

  def addSerialized(bytes: Array[Byte]): Unit = {
    val fam = if (bytes.length > 2) bytes(2).toInt else -1
    fam match {
      case 15 =>
        checkFamily(15)
        val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
        if (kll == null) { kll = KllDoublesSketch.newHeapInstance(); family = 15 }
        kll.merge(sk)
      case 7 =>
        checkFamily(7)
        if (hll == null) { hll = new HllUnion(); family = 7 }
        hll.update(HllSketch.heapify(Memory.wrap(bytes)))
      case _ =>
        checkFamily(0)
        val sd = SetDigestBuffer.deserialize(bytes)
        if (set == null) { set = new SetDigestBuffer(sd.maxHashes); family = 0 }
        set.mergeWith(sd)
    }
  }

  def mergeWith(other: MergeSketchBuffer): Unit = {
    if (other.family == -1) return
    checkFamily(other.family)
    other.family match {
      case 15 =>
        if (kll == null) { kll = KllDoublesSketch.newHeapInstance(); family = 15 }
        kll.merge(other.kll)
      case 7 =>
        if (hll == null) { hll = new HllUnion(); family = 7 }
        hll.update(other.hll.getResult)
      case 0 =>
        if (set == null) { set = new SetDigestBuffer(other.set.maxHashes); family = 0 }
        set.mergeWith(other.set)
    }
  }

  def result(): Array[Byte] = family match {
    case 15 => kll.toByteArray
    case 7 => hll.getResult.toUpdatableByteArray
    case 0 => set.serialize()
    case _ => null
  }
}

case class MergeSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MergeSketchBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "merge"

  override def createAggregationBuffer(): MergeSketchBuffer = new MergeSketchBuffer()

  override def update(buf: MergeSketchBuffer, input: InternalRow): MergeSketchBuffer = {
    val v = child.eval(input)
    if (v != null) buf.addSerialized(v.asInstanceOf[Array[Byte]])
    buf
  }

  override def merge(buf: MergeSketchBuffer, other: MergeSketchBuffer): MergeSketchBuffer = {
    buf.mergeWith(other); buf
  }

  override def eval(buf: MergeSketchBuffer): Any = buf.result()

  override def serialize(buf: MergeSketchBuffer): Array[Byte] = {
    val payload = buf.result()
    if (payload == null) Array.emptyByteArray else payload
  }

  override def deserialize(b: Array[Byte]): MergeSketchBuffer = {
    val buf = new MergeSketchBuffer()
    if (b.nonEmpty) buf.addSerialized(b)
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MergeSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MergeSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MergeSketchAgg =
    copy(child = c(0))
}
