package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KDB-tree spatial partitioning — the reference's
  * `spatial_partitioning` aggregate + `spatial_partitions` scalar
  * (presto-geospatial SpatialPartitioningAggregateFunction.java,
  * SpatialPartitionFunctions.java, KdbTree.java), the pair its
  * optimizer uses to co-partition both sides of a big×big spatial
  * join. Spark-first shape: learn the tree once over a SAMPLE of the
  * build side (one aggregate), broadcast the small tree string, add a
  * `spatial_partitions(tree, geom)` column to BOTH sides, explode, and
  * equi-join on the partition id — the same bucket-then-rescore join
  * the grid-cell distance path uses, but with data-adaptive cell
  * boundaries that absorb skew (dense regions get small cells).
  *
  * Determinism under partition-order (the property partial-agg merge
  * needs): the sample is a BOTTOM-K set keyed by xxhash64 of the
  * geometry text (ties broken by center coords) — a set function of
  * the input multiset, independent of arrival order — and the tree is
  * built only at eval time: axis-alternating recursive splits at the
  * LOWER MEDIAN (element (n−1)/2 of the axis-sorted sample) down to
  * `partitions` leaves (power of two), leaf ids in lo-first DFS order.
  * The emitted tree is a small JSON string; `spatial_partitions` walks
  * it with a geometry's envelope (optionally expanded by a distance),
  * returning every leaf id whose extent intersects it — a point lands
  * in exactly one (split rule: axis value < split → lo, ≥ split → hi;
  * leaf extents partition the plane, outermost boundaries open).
  */
object KdbTree {
  sealed trait Node
  final case class Leaf(id: Int) extends Node
  /** axis 0 = x, 1 = y; lo is the strict <-side. */
  final case class Split(axis: Int, at: Double, lo: Node, hi: Node) extends Node

  def build(centers: Array[(Double, Double)], partitions: Int): Node = {
    require(partitions >= 1 && (partitions & (partitions - 1)) == 0,
      "spatial_partitioning: partition count must be a power of two")
    val nextId = new java.util.concurrent.atomic.AtomicInteger(0)
    def rec(pts: Array[(Double, Double)], leaves: Int, axis: Int): Node =
      if (leaves == 1) Leaf(nextId.getAndIncrement())
      else {
        val vals = pts.map(p => if (axis == 0) p._1 else p._2).sorted
        // empty sub-sample (all points fell on one side of an ancestor
        // split): still emit the leaf structure, splitting at NaN-safe 0
        val at = if (vals.isEmpty) 0.0 else vals((vals.length - 1) / 2)
        val (lo, hi) = pts.partition(p => (if (axis == 0) p._1 else p._2) < at)
        Split(axis, at,
          rec(lo, leaves / 2, 1 - axis),
          rec(hi, leaves / 2, 1 - axis))
      }
    rec(centers, partitions, 0)
  }

  def toJson(n: Node): String = n match {
    case Leaf(id) => s"""{"leaf":$id}"""
    case Split(axis, at, lo, hi) =>
      s"""{"axis":$axis,"split":$at,"lo":${toJson(lo)},"hi":${toJson(hi)}}"""
  }

  /** Parser for exactly the grammar [[toJson]] emits. */
  def fromJson(s: String): Node = {
    val in = new java.text.ParsePosition(0)
    def expect(lit: String): Unit = {
      require(s.startsWith(lit, in.getIndex), s"kdb tree parse: want $lit at ${in.getIndex}")
      in.setIndex(in.getIndex + lit.length)
    }
    def number(): Double = {
      val start = in.getIndex
      var i = start
      while (i < s.length && (s(i).isDigit || "+-.eE".contains(s(i)))) i += 1
      in.setIndex(i)
      s.substring(start, i).toDouble
    }
    def node(): Node =
      if (s.startsWith("{\"leaf\":", in.getIndex)) {
        expect("{\"leaf\":")
        val id = number().toInt
        expect("}")
        Leaf(id)
      } else {
        expect("{\"axis\":")
        val axis = number().toInt
        expect(",\"split\":")
        val at = number()
        expect(",\"lo\":")
        val lo = node()
        expect(",\"hi\":")
        val hi = node()
        expect("}")
        Split(axis, at, lo, hi)
      }
    node()
  }

  /** Leaf ids whose extent intersects the envelope (x0..x1, y0..y1). */
  def partitionsFor(n: Node, x0: Double, y0: Double, x1: Double, y1: Double): Seq[Int] =
    n match {
      case Leaf(id) => Seq(id)
      case Split(0, at, lo, hi) =>
        (if (x0 < at) partitionsFor(lo, x0, y0, math.min(x1, at), y1) else Nil) ++
          (if (x1 >= at) partitionsFor(hi, math.max(x0, at), y0, x1, y1) else Nil)
      case Split(_, at, lo, hi) =>
        (if (y0 < at) partitionsFor(lo, x0, y0, x1, math.min(y1, at)) else Nil) ++
          (if (y1 >= at) partitionsFor(hi, x0, math.max(y0, at), x1, y1) else Nil)
    }
}

/** Bottom-k (by geometry-text hash) envelope-center sample. */
final class SpatialPartBuffer(val maxSample: Int, var partitions: Int) {
  private[functions] val sample =
    new java.util.TreeMap[(Long, Double, Double), Unit](
      implicitly[Ordering[(Long, Double, Double)]])

  def add(wkt: UTF8String): Unit = {
    // coordinate-free geometries (POINT EMPTY, GEOMETRYCOLLECTION of
    // empties, …) have no envelope; the reference's aggregate skips
    // them (SpatialPartitioningInternalAggregateFunction.input returns
    // on null envelope)
    GeoAlgorithms.envelopeOpt(wkt.toString) match {
      case None => ()
      case Some((x0, y0, x1, y1)) =>
        val key = (XXH64.hashUnsafeBytes(wkt.getBaseObject, wkt.getBaseOffset,
          wkt.numBytes, 0L), (x0 + x1) / 2, (y0 + y1) / 2)
        sample.put(key, ())
        if (sample.size > maxSample) sample.remove(sample.lastKey())
    }
  }

  def mergeWith(o: SpatialPartBuffer): Unit = {
    if (partitions == 0) partitions = o.partitions
    val it = o.sample.keySet().iterator()
    while (it.hasNext) {
      sample.put(it.next(), ())
      if (sample.size > maxSample) sample.remove(sample.lastKey())
    }
  }

  def result(): String = {
    if (sample.isEmpty) return null
    val centers = new Array[(Double, Double)](sample.size)
    val it = sample.keySet().iterator()
    var i = 0
    while (it.hasNext) { val k = it.next(); centers(i) = (k._2, k._3); i += 1 }
    KdbTree.toJson(KdbTree.build(centers, math.max(partitions, 1)))
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(1)
    out.writeInt(partitions)
    out.writeInt(sample.size)
    val it = sample.keySet().iterator()
    while (it.hasNext) {
      val k = it.next()
      out.writeLong(k._1); out.writeDouble(k._2); out.writeDouble(k._3)
    }
    out.flush()
    bos.toByteArray
  }
}

object SpatialPartBuffer {
  val MaxSample = 4096

  def deserialize(bytes: Array[Byte]): SpatialPartBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    require(in.readInt() == 1, "unknown spatial_partitioning buffer version")
    val buf = new SpatialPartBuffer(MaxSample, in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      buf.sample.put((in.readLong(), in.readDouble(), in.readDouble()), ())
      i += 1
    }
    buf
  }
}

/** spatial_partitioning(geometry, partitions) → KDB-tree JSON string. */
case class SpatialPartitioningAgg(
    child: Expression,
    partitionsExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpatialPartBuffer] {

  override def children: Seq[Expression] = Seq(child, partitionsExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "spatial_partitioning"

  private lazy val partitions: Int = {
    require(partitionsExpr.foldable,
      "spatial_partitioning: partition count must be a literal")
    partitionsExpr.eval(null).asInstanceOf[Number].intValue()
  }

  override def createAggregationBuffer(): SpatialPartBuffer =
    new SpatialPartBuffer(SpatialPartBuffer.MaxSample, partitions)

  override def update(buf: SpatialPartBuffer, input: InternalRow): SpatialPartBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(buf: SpatialPartBuffer, other: SpatialPartBuffer): SpatialPartBuffer = {
    buf.mergeWith(other); buf
  }

  override def eval(buf: SpatialPartBuffer): Any = {
    val r = buf.result()
    if (r == null) null else UTF8String.fromString(r)
  }

  override def serialize(buf: SpatialPartBuffer): Array[Byte] = buf.serialize()
  override def deserialize(b: Array[Byte]): SpatialPartBuffer =
    SpatialPartBuffer.deserialize(b)

  override def withNewMutableAggBufferOffset(o: Int): SpatialPartitioningAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpatialPartitioningAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): SpatialPartitioningAgg =
    copy(child = c(0), partitionsExpr = c(1))
}

private[functions] object KdbTreeCache {
  // trees are tiny and one query uses one tree; a 1-entry memo per
  // executor avoids re-parsing the JSON for every row
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, KdbTree.Node]()
  def parse(json: String): KdbTree.Node = {
    if (cache.size > 16) cache.clear()
    cache.computeIfAbsent(json, KdbTree.fromJson)
  }
}

/** spatial_partitions(tree, geometry) → array<int> of leaf ids whose
  * extent intersects the geometry's envelope. */
case class SpatialPartitions(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "spatial_partitions"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  // EMPTY geometry → NULL even when both inputs are non-null
  override def nullable: Boolean = true

  override def nullSafeEval(tree: Any, geom: Any): Any = {
    val wkt = geom.asInstanceOf[UTF8String].toString
    // empty geometry → NULL, as in the reference (GeoFunctions.java:1133);
    // branch on an empty envelope (no coordinates), not a textual EMPTY
    // suffix — catches 'GEOMETRYCOLLECTION (POINT EMPTY)', whitespace, etc.
    GeoAlgorithms.envelopeOpt(wkt) match {
      case None => null
      case Some((x0, y0, x1, y1)) =>
        val node = KdbTreeCache.parse(tree.asInstanceOf[UTF8String].toString)
        new GenericArrayData(
          KdbTree.partitionsFor(node, x0, y0, x1, y1).sorted.toArray)
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SpatialPartitions =
    copy(left = l, right = r)
}

/** spatial_partitions(tree, geometry, distance) — distance-join form:
  * the envelope expands by `distance` before the tree walk, so two
  * geometries within `distance` always share at least one partition. */
case class SpatialPartitionsWithin(
    first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with CodegenFallback {
  override def prettyName: String = "spatial_partitions"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  // EMPTY geometry → NULL even when all inputs are non-null
  override def nullable: Boolean = true

  override def nullSafeEval(tree: Any, geom: Any, dist: Any): Any = {
    val d = dist.asInstanceOf[Double]
    // reference raises INVALID_FUNCTION_ARGUMENT for all three
    // (GeoFunctions.java:1147-1157); a silently-accepted negative
    // distance would SHRINK the envelope and drop within-distance pairs
    if (d.isNaN) throw new IllegalArgumentException("distance is NaN")
    if (d.isInfinite) throw new IllegalArgumentException("distance is infinite")
    if (d < 0) throw new IllegalArgumentException("distance is negative")
    val wkt = geom.asInstanceOf[UTF8String].toString
    GeoAlgorithms.envelopeOpt(wkt) match {
      case None => null
      case Some((x0, y0, x1, y1)) =>
        val node = KdbTreeCache.parse(tree.asInstanceOf[UTF8String].toString)
        new GenericArrayData(
          KdbTree.partitionsFor(node, x0 - d, y0 - d, x1 + d, y1 + d).sorted.toArray)
    }
  }

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression): SpatialPartitionsWithin =
    copy(first = a, second = b, third = c)
}
