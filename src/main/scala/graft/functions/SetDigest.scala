package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SET_DIGEST — the reference's mergeable set-similarity sketch
  * (SetDigestType, registry :140; SetDigestFunctions.java: cardinality,
  * intersection_cardinality, jaccard_index, hash_counts; aggregates
  * make_set_digest / merge). Presto pairs a MinHash table with an HLL;
  * this Spark-native build uses a single bottom-k (KMV) sketch — the k
  * smallest 64-bit hashes with multiplicities — which serves all three
  * estimators from one mergeable state:
  *
  *  - cardinality: exact |keys| while under k, else the standard KMV
  *    estimator (k−1)/U₍ₖ₎ (Bar-Yossef et al., "Counting Distinct
  *    Elements in a Data Stream").
  *  - jaccard_index: bottom-k of the union, fraction present in both —
  *    the classic one-permutation MinHash estimate, exact when both
  *    sets fit under k.
  *  - intersection_cardinality: jaccard × union cardinality, as in the
  *    reference.
  *
  * Elements are hashed with xxhash64 (same family as the engine's other
  * hash surfaces); hashes are compared UNSIGNED, matching the uniform
  * [0, 2⁶⁴) model the estimators assume.
  */
final class SetDigestBuffer(val maxHashes: Int) {
  // true once any hash has been evicted: size == k with no eviction
  // means the digest still holds EVERY distinct hash, so cardinality
  // stays exact right up to k instead of an accuracy cliff AT k
  private[functions] var everEvicted: Boolean = false

  // k smallest unsigned hashes → multiplicity. Values are boxed
  // Integer, NOT Scala Int: get() on an Int-valued Java map silently
  // unboxes the absent-key null to 0, making the null check vacuous
  // (and the map unbounded).
  private[functions] val hashes =
    new java.util.TreeMap[java.lang.Long, java.lang.Integer](
      (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compareUnsigned(a, b))

  def addHash(h: Long, count: Int = 1): Unit = {
    val existing = hashes.get(h)
    if (existing != null) {
      hashes.put(h, math.min(existing.intValue() + count, Short.MaxValue.toInt))
    } else if (hashes.size < maxHashes) {
      hashes.put(h, math.min(count, Short.MaxValue.toInt))
    } else if (java.lang.Long.compareUnsigned(h, hashes.lastKey()) < 0) {
      hashes.remove(hashes.lastKey())
      hashes.put(h, math.min(count, Short.MaxValue.toInt))
      everEvicted = true
    } else everEvicted = true
  }

  def mergeWith(other: SetDigestBuffer): Unit = {
    everEvicted ||= other.everEvicted
    val it = other.hashes.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); addHash(e.getKey, e.getValue.intValue()) }
  }

  /** Exact while nothing was evicted (≤ k); KMV (k−1)/U₍ₖ₎ beyond. */
  def cardinality: Long =
    if (!everEvicted) hashes.size.toLong
    else {
      val kth = hashes.lastKey().longValue()
      // unsigned kth / 2^64 ∈ (0, 1] (negative long ⇒ top half of range)
      val u = kth.toDouble * math.pow(2, -64) + (if (kth < 0) 1.0 else 0.0)
      math.round((maxHashes - 1) / math.max(u, java.lang.Double.MIN_NORMAL))
    }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(2) // version 2: added the everEvicted flag (ADVICE r3)
    out.writeInt(maxHashes)
    out.writeBoolean(everEvicted)
    out.writeInt(hashes.size)
    val it = hashes.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeLong(e.getKey)
      out.writeInt(e.getValue.intValue())
    }
    out.flush()
    bos.toByteArray
  }
}

object SetDigestBuffer {
  val DefaultMaxHashes = 8192

  def deserialize(bytes: Array[Byte]): SetDigestBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    require(in.readInt() == 2, "unknown set digest version")
    val buf = new SetDigestBuffer(in.readInt())
    val evicted = in.readBoolean()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.addHash(in.readLong(), in.readInt()); i += 1 }
    buf.everEvicted ||= evicted
    buf
  }

  def hashValue(v: Any): Long = v match {
    case l: Long => XXH64.hashLong(l, 0L)
    case i: Int => XXH64.hashLong(i.toLong, 0L)
    case s: Short => XXH64.hashLong(s.toLong, 0L)
    case b: Byte => XXH64.hashLong(b.toLong, 0L)
    case u: UTF8String => XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 0L)
    case d: Double => XXH64.hashLong(java.lang.Double.doubleToLongBits(d), 0L)
    case f: Float => XXH64.hashLong(java.lang.Float.floatToIntBits(f).toLong, 0L)
    case b: Boolean => XXH64.hashLong(if (b) 1L else 0L, 0L)
    case other =>
      val bytes = other.toString.getBytes("UTF-8")
      XXH64.hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        bytes.length, 0L)
  }

  /** Bottom-k MinHash Jaccard: fraction of the union's k smallest
    * hashes present in both digests. */
  def jaccard(a: SetDigestBuffer, b: SetDigestBuffer): Double = {
    val union = new java.util.TreeSet[java.lang.Long](
      (x: java.lang.Long, y: java.lang.Long) => java.lang.Long.compareUnsigned(x, y))
    union.addAll(a.hashes.keySet())
    union.addAll(b.hashes.keySet())
    val k = math.min(math.min(a.maxHashes, b.maxHashes), union.size)
    if (k == 0) return 1.0
    var inBoth = 0
    var seen = 0
    val it = union.iterator()
    while (it.hasNext && seen < k) {
      val h = it.next()
      if (a.hashes.containsKey(h) && b.hashes.containsKey(h)) inBoth += 1
      seen += 1
    }
    inBoth.toDouble / k
  }

  def intersectionCardinality(a: SetDigestBuffer, b: SetDigestBuffer): Long = {
    val merged = new SetDigestBuffer(math.min(a.maxHashes, b.maxHashes))
    merged.mergeWith(a)
    merged.mergeWith(b)
    math.round(jaccard(a, b) * merged.cardinality.toDouble)
  }
}

case class SetDigestAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SetDigestBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "make_set_digest"

  override def createAggregationBuffer(): SetDigestBuffer =
    new SetDigestBuffer(SetDigestBuffer.DefaultMaxHashes)

  override def update(buf: SetDigestBuffer, input: InternalRow): SetDigestBuffer = {
    val v = child.eval(input)
    if (v != null) buf.addHash(SetDigestBuffer.hashValue(v))
    buf
  }

  override def merge(buf: SetDigestBuffer, other: SetDigestBuffer): SetDigestBuffer = {
    buf.mergeWith(other); buf
  }

  override def eval(buf: SetDigestBuffer): Any = buf.serialize()
  override def serialize(buf: SetDigestBuffer): Array[Byte] = buf.serialize()
  override def deserialize(b: Array[Byte]): SetDigestBuffer =
    SetDigestBuffer.deserialize(b)

  override def withNewMutableAggBufferOffset(o: Int): SetDigestAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SetDigestAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): SetDigestAgg =
    copy(child = c(0))
}

/** merge(setdigest) — re-aggregates serialized digests. */
case class SetDigestMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SetDigestBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "merge_set_digest"

  override def createAggregationBuffer(): SetDigestBuffer =
    new SetDigestBuffer(SetDigestBuffer.DefaultMaxHashes)

  override def update(buf: SetDigestBuffer, input: InternalRow): SetDigestBuffer = {
    val v = child.eval(input)
    if (v != null) buf.mergeWith(SetDigestBuffer.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: SetDigestBuffer, other: SetDigestBuffer): SetDigestBuffer = {
    buf.mergeWith(other); buf
  }

  override def eval(buf: SetDigestBuffer): Any = buf.serialize()
  override def serialize(buf: SetDigestBuffer): Array[Byte] = buf.serialize()
  override def deserialize(b: Array[Byte]): SetDigestBuffer =
    SetDigestBuffer.deserialize(b)

  override def withNewMutableAggBufferOffset(o: Int): SetDigestMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SetDigestMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): SetDigestMergeAgg =
    copy(child = c(0))
}

case class SetDigestCardinality(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "set_digest_cardinality"
  override def nullSafeEval(b: Any): Any =
    SetDigestBuffer.deserialize(b.asInstanceOf[Array[Byte]]).cardinality
  override protected def withNewChildInternal(c: Expression): SetDigestCardinality =
    copy(child = c)
}

case class JaccardIndex(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_index"
  override def nullSafeEval(a: Any, b: Any): Any =
    SetDigestBuffer.jaccard(
      SetDigestBuffer.deserialize(a.asInstanceOf[Array[Byte]]),
      SetDigestBuffer.deserialize(b.asInstanceOf[Array[Byte]]))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardIndex =
    copy(left = l, right = r)
}

case class IntersectionCardinality(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "intersection_cardinality"
  override def nullSafeEval(a: Any, b: Any): Any =
    SetDigestBuffer.intersectionCardinality(
      SetDigestBuffer.deserialize(a.asInstanceOf[Array[Byte]]),
      SetDigestBuffer.deserialize(b.asInstanceOf[Array[Byte]]))
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): IntersectionCardinality =
    copy(left = l, right = r)
}

/** hash_counts(setdigest) → map<bigint, int> of hash → multiplicity. */
case class HashCounts(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = MapType(LongType, IntegerType, valueContainsNull = false)
  override def prettyName: String = "hash_counts"
  override def nullSafeEval(b: Any): Any = {
    val buf = SetDigestBuffer.deserialize(b.asInstanceOf[Array[Byte]])
    val keys = new Array[Any](buf.hashes.size)
    val vals = new Array[Any](buf.hashes.size)
    val it = buf.hashes.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      keys(i) = e.getKey.longValue()
      vals(i) = e.getValue.intValue()
      i += 1
    }
    ArrayBasedMapData(keys, vals)
  }
  override protected def withNewChildInternal(c: Expression): HashCounts =
    copy(child = c)
}
