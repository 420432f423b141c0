package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Mergeable quantile sketch surface mirroring Presto's qdigest
  * (reference: presto-main/.../aggregation/QuantileDigestAggregationFunction.java
  * + operator/scalar/QuantileDigestFunctions.java, registry
  * FunctionRegistry.java:495-496):
  *
  *   qdigest_agg(x)        → binary sketch per group
  *   merge_qdigest(sketch) → binary union of sketches
  *   value_at_quantile(sketch, q) → double
  *
  * Backed by the KLL sketch (DataSketches), the same family Spark uses
  * internally for approx aggregates: fixed O(k log n) memory per group,
  * associative lossless merge — the property that makes two-level
  * (partial → final) aggregation exact w.r.t. the sketch, so a 100 TB
  * group-by never buffers raw values. KLL compaction is randomized, so
  * estimates carry a ±~1.7% rank error (k=200) rather than being
  * bit-deterministic; correctness checks are therefore error-bound
  * properties, exactly as Presto tests its qdigest.
  */
final class QdigestBuffer(var sketch: KllDoublesSketch)

abstract class QdigestAggBase extends TypedImperativeAggregate[QdigestBuffer] {
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): QdigestBuffer =
    new QdigestBuffer(KllDoublesSketch.newHeapInstance())

  override def merge(buf: QdigestBuffer, other: QdigestBuffer): QdigestBuffer = {
    buf.sketch.merge(other.sketch)
    buf
  }

  override def eval(buf: QdigestBuffer): Any = buf.sketch.toByteArray

  override def serialize(buf: QdigestBuffer): Array[Byte] = buf.sketch.toByteArray

  override def deserialize(bytes: Array[Byte]): QdigestBuffer =
    new QdigestBuffer(KllDoublesSketch.heapify(Memory.wrap(bytes)))
}

/** qdigest_agg(x): build a sketch from raw doubles. */
case class QdigestAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends QdigestAggBase {

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "qdigest_agg"

  override def update(buf: QdigestBuffer, input: InternalRow): QdigestBuffer = {
    val v = child.eval(input)
    if (v != null) buf.sketch.update(v.asInstanceOf[Number].doubleValue())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QdigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QdigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QdigestAgg =
    copy(child = newChildren(0))
}

/** merge_qdigest(sketch): union pre-built binary sketches — the
  * re-aggregation path (Presto merge(qdigest)). */
case class QdigestMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends QdigestAggBase {

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "merge_qdigest"

  override def update(buf: QdigestBuffer, input: InternalRow): QdigestBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val other = KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]]))
      buf.sketch.merge(other)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QdigestMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QdigestMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QdigestMergeAgg =
    copy(child = newChildren(0))
}

/** value_at_quantile(sketch, q) → approximate quantile value
  * (QuantileDigestFunctions.valueAtQuantile). */
case class ValueAtQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "value_at_quantile"

  override def nullSafeEval(sketchBytes: Any, q: Any): Any = {
    val sk = KllDoublesSketch.heapify(
      Memory.wrap(sketchBytes.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else sk.getQuantile(q.asInstanceOf[Number].doubleValue())
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ValueAtQuantile =
    copy(left = newLeft, right = newRight)
}

/** values_at_quantiles(sketch, array(q…)) → array of quantile values
  * (QuantileDigestFunctions.valuesAtQuantiles). */
case class ValuesAtQuantiles(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "values_at_quantiles"

  override def nullSafeEval(sketchBytes: Any, qs: Any): Any = {
    val sk = KllDoublesSketch.heapify(
      Memory.wrap(sketchBytes.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else {
      val arr = qs.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toDoubleArray()
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        arr.map(sk.getQuantile))
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ValuesAtQuantiles =
    copy(left = newLeft, right = newRight)
}

/** quantile_at_value(sketch, v) → the value's normalized rank in [0,1]
  * (QuantileDigestFunctions.quantileAtValue). */
case class QuantileAtValue(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "quantile_at_value"

  override def nullSafeEval(sketchBytes: Any, v: Any): Any = {
    val sk = KllDoublesSketch.heapify(
      Memory.wrap(sketchBytes.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else sk.getRank(v.asInstanceOf[Number].doubleValue())
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantileAtValue =
    copy(left = newLeft, right = newRight)
}
