package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** presto-ml learn/classify/regress tier (MLFunctions.java,
  * LearnRegressorAggregation.java, LearnClassifierAggregation.java,
  * EvaluateClassifierPredictionsAggregation.java; registry via MLPlugin).
  *
  * The reference trains libsvm models: its LearnState BUFFERS EVERY ROW
  * (label + feature vector) and fits on a single node at output time —
  * a design that cannot survive 100 TB. This Spark-native tier keeps the
  * same SQL surface (model as an opaque varbinary, learned by an
  * aggregate, applied by a scalar) but picks single-pass MERGEABLE
  * sufficient statistics so the learn step is a true distributed
  * aggregate with map-side partials:
  *
  *  - learn_regressor: ordinary least squares via the normal equations —
  *    the buffer is the Gram matrix XᵀX and moment vector Xᵀy over the
  *    intercept-augmented feature vector (O(d²) state, independent of
  *    row count); eval solves by Gaussian elimination with partial
  *    pivoting. Exact, deterministic, and closed-form — not an SVM, but
  *    the honest distributed-analytics counterpart (documented
  *    divergence, SURVEY §2.8 ML row).
  *  - learn_classifier: nearest-centroid (Rocchio) classifier — per
  *    label, count + feature-sum (O(classes × d) state). classify
  *    assigns the label whose centroid minimizes squared euclidean
  *    distance, ties broken by label order for determinism.
  *  - evaluate_classifier_predictions: exact port of the reference's
  *    accuracy/precision/recall summary (same format string), except
  *    class sections are emitted in SORTED label order — the reference
  *    iterates hash-set union order, which is not deterministic under
  *    distributed combines.
  *
  * Feature vectors arrive as `features(d1, …, dN)` maps (map<bigint,
  * double>, MLFeaturesFunctions.java); missing indices are zeros.
  * Models are version-tagged binary blobs; `classify`/`regress` memoize
  * the decoded model per task thread (the reference's MODEL_CACHE,
  * MLFunctions.java:36) keyed by blob identity, since the model column
  * is a single broadcast value repeated across millions of rows.
  */
object MlModel {
  val MaxDim = 1024
  private val RegressorTag = 1
  private val ClassifierTag = 2

  final case class Regressor(weights: Array[Double], intercept: Double) {
    def predict(x: Array[Double]): Double = {
      var s = intercept
      val n = math.min(x.length, weights.length)
      var i = 0
      while (i < n) { s += weights(i) * x(i); i += 1 }
      s
    }
  }

  /** Labels sorted ascending (numerically when every label is an
    * integer — the bigint overload's order — else lexicographically);
    * centroid rows align with labels. */
  final case class Classifier(labels: Array[String], centroids: Array[Array[Double]]) {
    def classify(x: Array[Double]): String = {
      require(labels.nonEmpty,
        "classify: model was trained on zero rows (empty input or all labels/features null)")
      var best = 0
      var bestD = Double.PositiveInfinity
      var k = 0
      while (k < labels.length) {
        val c = centroids(k)
        var d = 0.0
        val n = math.max(c.length, x.length)
        var i = 0
        while (i < n) {
          val diff = (if (i < x.length) x(i) else 0.0) - (if (i < c.length) c(i) else 0.0)
          d += diff * diff
          i += 1
        }
        // strict < keeps the FIRST (smallest, labels are sorted) label on ties
        if (d < bestD) { bestD = d; best = k }
        k += 1
      }
      labels(best)
    }
  }

  def serializeRegressor(m: Regressor): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(1)
    out.writeInt(RegressorTag)
    out.writeInt(m.weights.length)
    out.writeDouble(m.intercept)
    m.weights.foreach(out.writeDouble)
    out.flush(); bos.toByteArray
  }

  def serializeClassifier(m: Classifier): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(1)
    out.writeInt(ClassifierTag)
    out.writeInt(m.labels.length)
    var k = 0
    while (k < m.labels.length) {
      out.writeUTF(m.labels(k))
      out.writeInt(m.centroids(k).length)
      m.centroids(k).foreach(out.writeDouble)
      k += 1
    }
    out.flush(); bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Any = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    require(in.readInt() == 1, "unknown ml model version")
    in.readInt() match {
      case RegressorTag =>
        val d = in.readInt()
        val b = in.readDouble()
        Regressor(Array.fill(d)(in.readDouble()), b)
      case ClassifierTag =>
        val k = in.readInt()
        val labels = new Array[String](k)
        val cents = new Array[Array[Double]](k)
        var i = 0
        while (i < k) {
          labels(i) = in.readUTF()
          cents(i) = Array.fill(in.readInt())(in.readDouble())
          i += 1
        }
        Classifier(labels, cents)
      case t => throw new IllegalArgumentException(s"ml model: unknown tag $t")
    }
  }

  // per-task-thread decode memo (same rationale as GeoExpressions.ringCache:
  // a shared lock on the per-row hot path would serialize all 32 task
  // threads; the model column repeats one broadcast blob per row)
  private val modelCache =
    ThreadLocal.withInitial[java.util.LinkedHashMap[java.nio.ByteBuffer, Any]](
      () => new java.util.LinkedHashMap[java.nio.ByteBuffer, Any](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[java.nio.ByteBuffer, Any]): Boolean = size() > 16
      })

  def decodeCached(bytes: Array[Byte]): Any = {
    val cache = modelCache.get()
    val key = java.nio.ByteBuffer.wrap(bytes)
    var m = cache.get(key)
    if (m == null) { m = deserialize(bytes); cache.put(key, m) }
    m
  }

  /** features() map → dense vector; indices beyond MaxDim rejected. */
  def toDense(m: MapData): Array[Double] = {
    val n = m.numElements()
    val keys = m.keyArray()
    val vals = m.valueArray()
    var maxIdx = -1
    var i = 0
    while (i < n) {
      val k = keys.getLong(i)
      require(k >= 0 && k < MaxDim, s"ml feature index $k out of range [0, $MaxDim)")
      if (k > maxIdx) maxIdx = k.toInt
      i += 1
    }
    val x = new Array[Double](maxIdx + 1)
    i = 0
    while (i < n) {
      x(keys.getLong(i).toInt) = if (vals.isNullAt(i)) 0.0 else vals.getDouble(i)
      i += 1
    }
    x
  }

  /** Solve A·w = b (A symmetric (d+1)², row-major, slot 0 = intercept)
    * by Gaussian elimination with partial pivoting. A zero pivot (an
    * all-constant or absent feature) deterministically zeroes that
    * coefficient instead of failing. Mutates its inputs.
    *
    * The system is Jacobi-equilibrated first — D⁻¹AD⁻¹(Dw) = D⁻¹b with
    * D = diag(√aᵢᵢ) — so the dependence threshold tests CORRELATION,
    * not raw magnitude: XᵀX entries scale with feature² × rows, and a
    * fixed cutoff on the raw matrix would silently zero a perfectly
    * informative feature whose unit happens to be tiny. */
  def solveNormalEq(a: Array[Double], b: Array[Double]): Array[Double] = {
    val n = b.length
    val scale = new Array[Double](n)
    var d = 0
    while (d < n) {
      scale(d) = if (a(d * n + d) > 0.0) math.sqrt(a(d * n + d)) else 1.0
      d += 1
    }
    var si = 0
    while (si < n) {
      var sj = 0
      while (sj < n) { a(si * n + sj) /= scale(si) * scale(sj); sj += 1 }
      b(si) /= scale(si)
      si += 1
    }
    // equilibrated diagonal is 1, so this cutoff is a correlation test
    val pivotEps = 1e-10
    var row = 0
    while (row < n) {
      var p = row
      var i = row
      while (i < n) {
        if (math.abs(a(i * n + row)) > math.abs(a(p * n + row))) p = i
        i += 1
      }
      if (math.abs(a(p * n + row)) < pivotEps) {
        // dependent column: zero its row/column so back-substitution yields 0
        i = 0
        while (i < n) { a(i * n + row) = 0.0; a(row * n + i) = 0.0; i += 1 }
        a(row * n + row) = 1.0
        b(row) = 0.0
      } else if (p != row) {
        i = 0
        while (i < n) {
          val t = a(p * n + i); a(p * n + i) = a(row * n + i); a(row * n + i) = t
          i += 1
        }
        val t = b(p); b(p) = b(row); b(row) = t
      }
      i = row + 1
      while (i < n) {
        val f = a(i * n + row) / a(row * n + row)
        if (f != 0.0) {
          var j = row
          while (j < n) { a(i * n + j) -= f * a(row * n + j); j += 1 }
          b(i) -= f * b(row)
        }
        i += 1
      }
      row += 1
    }
    val w = new Array[Double](n)
    row = n - 1
    while (row >= 0) {
      var s = b(row)
      var j = row + 1
      while (j < n) { s -= a(row * n + j) * w(j); j += 1 }
      w(row) = s / a(row * n + row)
      row -= 1
    }
    // undo the equilibration: the solved vector is D·w
    row = 0
    while (row < n) { w(row) /= scale(row); row += 1 }
    w
  }
}

/** Normal-equation accumulator: XᵀX and Xᵀy over (1, x). Grows to the
  * largest feature index seen; O(d²) memory, O(rows·d²) time, mergeable. */
final class RegressorBuffer(var dim: Int) {
  var n: Long = 0L
  var xtx: Array[Double] = new Array[Double]((dim + 1) * (dim + 1))
  var xty: Array[Double] = new Array[Double](dim + 1)

  def ensureDim(d: Int): Unit = {
    if (d > dim) {
      val m = d + 1
      val nx = new Array[Double](m * m)
      var i = 0
      while (i <= dim) {
        var j = 0
        while (j <= dim) { nx(i * m + j) = xtx(i * (dim + 1) + j); j += 1 }
        i += 1
      }
      val ny = new Array[Double](m)
      System.arraycopy(xty, 0, ny, 0, dim + 1)
      xtx = nx; xty = ny; dim = d
    }
  }

  def add(y: Double, x: Array[Double]): Unit = {
    ensureDim(x.length)
    val m = dim + 1
    // x̃(0) = 1 (intercept), x̃(i+1) = x(i); only the seen prefix is non-zero
    var i = 0
    while (i <= x.length) {
      val xi = if (i == 0) 1.0 else x(i - 1)
      if (xi != 0.0) {
        var j = 0
        while (j <= x.length) {
          val xj = if (j == 0) 1.0 else x(j - 1)
          xtx(i * m + j) += xi * xj
          j += 1
        }
        xty(i) += xi * y
      }
      i += 1
    }
    n += 1
  }

  def mergeWith(o: RegressorBuffer): Unit = {
    ensureDim(o.dim)
    val m = dim + 1
    val om = o.dim + 1
    var i = 0
    while (i < om) {
      var j = 0
      while (j < om) { xtx(i * m + j) += o.xtx(i * om + j); j += 1 }
      xty(i) += o.xty(i)
      i += 1
    }
    n += o.n
  }

  def toModel: Array[Byte] = {
    val w = MlModel.solveNormalEq(xtx.clone(), xty.clone())
    MlModel.serializeRegressor(MlModel.Regressor(w.drop(1), w(0)))
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(dim); out.writeLong(n)
    xtx.foreach(out.writeDouble); xty.foreach(out.writeDouble)
    out.flush(); bos.toByteArray
  }
}

object RegressorBuffer {
  def deserialize(bytes: Array[Byte]): RegressorBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new RegressorBuffer(in.readInt())
    buf.n = in.readLong()
    var i = 0
    while (i < buf.xtx.length) { buf.xtx(i) = in.readDouble(); i += 1 }
    i = 0
    while (i < buf.xty.length) { buf.xty(i) = in.readDouble(); i += 1 }
    buf
  }
}

/** Per-label count + feature-sum; centroid = sum/count at eval. */
final class CentroidBuffer {
  val classes = new java.util.TreeMap[String, (Long, Array[Double])]()

  def add(label: String, x: Array[Double], count: Long = 1L): Unit = {
    require(classes.size < 100000 || classes.containsKey(label),
      "learn_classifier: more than 100000 distinct labels")
    val cur = classes.get(label)
    if (cur == null) classes.put(label, (count, x.clone()))
    else {
      var (c, s) = cur
      if (x.length > s.length) {
        val ns = new Array[Double](x.length)
        System.arraycopy(s, 0, ns, 0, s.length)
        s = ns
      }
      var i = 0
      while (i < x.length) { s(i) += x(i); i += 1 }
      classes.put(label, (c + count, s))
    }
  }

  def mergeWith(o: CentroidBuffer): Unit = {
    val it = o.classes.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(e.getKey, e.getValue._2, e.getValue._1)
    }
  }

  def toModel: Array[Byte] = {
    var labels = new Array[String](classes.size)
    val byLabel = new java.util.HashMap[String, Array[Double]]()
    val it = classes.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      labels(k) = e.getKey
      byLabel.put(e.getKey, e.getValue._2.map(_ / e.getValue._1))
      k += 1
    }
    // tie-break order: numeric when every label is an integer (the
    // bigint learn_classifier overload — lexicographic would rank
    // "10" before "2"), else lexicographic (TreeMap order already)
    val asLongs = labels.flatMap(l => scala.util.Try(l.toLong).toOption)
    if (asLongs.length == labels.length)
      labels = labels.sortBy(_.toLong)
    MlModel.serializeClassifier(
      MlModel.Classifier(labels, labels.map(byLabel.get)))
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(classes.size)
    val it = classes.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey)
      out.writeLong(e.getValue._1)
      out.writeInt(e.getValue._2.length)
      e.getValue._2.foreach(out.writeDouble)
    }
    out.flush(); bos.toByteArray
  }
}

object CentroidBuffer {
  def deserialize(bytes: Array[Byte]): CentroidBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new CentroidBuffer
    val k = in.readInt()
    var i = 0
    while (i < k) {
      val label = in.readUTF()
      val c = in.readLong()
      val d = in.readInt()
      buf.add(label, Array.fill(d)(in.readDouble()), c)
      i += 1
    }
    buf
  }
}

/** learn_regressor(y double, features map<bigint,double>) → varbinary. */
case class LearnRegressorAgg(
    label: Expression,
    features: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[RegressorBuffer] {

  override def children: Seq[Expression] = Seq(label, features)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "learn_regressor"

  override def createAggregationBuffer(): RegressorBuffer = new RegressorBuffer(0)

  override def update(buf: RegressorBuffer, input: InternalRow): RegressorBuffer = {
    val y = label.eval(input)
    val f = features.eval(input)
    if (y != null && f != null)
      buf.add(y.asInstanceOf[Double], MlModel.toDense(f.asInstanceOf[MapData]))
    buf
  }

  override def merge(buf: RegressorBuffer, other: RegressorBuffer): RegressorBuffer = {
    buf.mergeWith(other); buf
  }

  override def eval(buf: RegressorBuffer): Any = buf.toModel
  override def serialize(buf: RegressorBuffer): Array[Byte] = buf.serialize()
  override def deserialize(b: Array[Byte]): RegressorBuffer =
    RegressorBuffer.deserialize(b)

  override def withNewMutableAggBufferOffset(o: Int): LearnRegressorAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): LearnRegressorAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): LearnRegressorAgg =
    copy(label = c(0), features = c(1))
}

/** learn_classifier(label, features) → varbinary. Accepts bigint or
  * varchar labels (the reference's two overloads); labels are stored as
  * their string form, `classify` re-parses for the bigint variant. */
case class LearnClassifierAgg(
    label: Expression,
    features: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CentroidBuffer] {

  override def children: Seq[Expression] = Seq(label, features)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "learn_classifier"

  override def createAggregationBuffer(): CentroidBuffer = new CentroidBuffer

  override def update(buf: CentroidBuffer, input: InternalRow): CentroidBuffer = {
    val l = label.eval(input)
    val f = features.eval(input)
    if (l != null && f != null)
      buf.add(l.toString, MlModel.toDense(f.asInstanceOf[MapData]))
    buf
  }

  override def merge(buf: CentroidBuffer, other: CentroidBuffer): CentroidBuffer = {
    buf.mergeWith(other); buf
  }

  override def eval(buf: CentroidBuffer): Any = buf.toModel
  override def serialize(buf: CentroidBuffer): Array[Byte] = buf.serialize()
  override def deserialize(b: Array[Byte]): CentroidBuffer =
    CentroidBuffer.deserialize(b)

  override def withNewMutableAggBufferOffset(o: Int): LearnClassifierAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): LearnClassifierAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): LearnClassifierAgg =
    copy(label = c(0), features = c(1))
}

/** regress(features, model) → double (MLFunctions.java:78). */
case class Regress(left: Expression, right: Expression)
  extends BinaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "regress"
  override def nullSafeEval(f: Any, m: Any): Any =
    MlModel.decodeCached(m.asInstanceOf[Array[Byte]]) match {
      case r: MlModel.Regressor => r.predict(MlModel.toDense(f.asInstanceOf[MapData]))
      case _ => throw new IllegalArgumentException("regress: model is not a regressor")
    }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Regress =
    copy(left = l, right = r)
}

/** classify(features, model): bigint when asString=false (the
  * reference's default overload), varchar as `classify_varchar` —
  * Spark resolves return types statically, so the model-parameterized
  * overload becomes two names (documented divergence). */
case class Classify(left: Expression, right: Expression, asString: Boolean)
  extends BinaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = if (asString) StringType else LongType
  override def prettyName: String = if (asString) "classify_varchar" else "classify"
  override def nullSafeEval(f: Any, m: Any): Any =
    MlModel.decodeCached(m.asInstanceOf[Array[Byte]]) match {
      case c: MlModel.Classifier =>
        val label = c.classify(MlModel.toDense(f.asInstanceOf[MapData]))
        if (asString) UTF8String.fromString(label)
        else try label.toLong catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"classify: model has varchar labels ('$label') — use classify_varchar")
        }
      case _ => throw new IllegalArgumentException("classify: model is not a classifier")
    }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Classify =
    copy(left = l, right = r)
}

/** evaluate_classifier_predictions(truth, prediction) → varchar summary
  * (EvaluateClassifierPredictionsAggregation.java:100-118 — identical
  * format; class sections sorted by label for determinism). */
final class EvalPredsBuffer {
  // boxed java.lang.Long values, NOT Scala Long: get() on a missing key
  // would silently unbox null to 0 and defeat the presence check (same
  // pitfall documented in SetDigestBuffer.hashes)
  val tp = new java.util.TreeMap[String, java.lang.Long]()
  val fp = new java.util.TreeMap[String, java.lang.Long]()
  val fn = new java.util.TreeMap[String, java.lang.Long]()

  private def bump(m: java.util.TreeMap[String, java.lang.Long], k: String, by: Long): Unit = {
    val cur = m.get(k)
    m.put(k, (if (cur == null) 0L else cur.longValue()) + by)
  }

  def add(truth: String, pred: String): Unit = {
    // same per-buffer label-cardinality guard as CentroidBuffer: a
    // mis-aimed call on a raw id/text column would otherwise grow
    // three maps without bound inside every partial-agg buffer
    require(tp.size + fp.size + fn.size < 300000 ||
      ((tp.containsKey(truth) || fn.containsKey(truth)) &&
        (tp.containsKey(pred) || fp.containsKey(pred))),
      "evaluate_classifier_predictions: more than 300000 distinct label entries")
    if (truth == pred) bump(tp, truth, 1L)
    else { bump(fp, pred, 1L); bump(fn, truth, 1L) }
  }

  // merges honor the same cardinality guard as add(): combining many
  // partial buffers must not grow past the bound the update path caps
  // (new keys are rejected once over budget; existing keys still bump)
  private def bumpChecked(m: java.util.TreeMap[String, java.lang.Long],
      k: String, by: Long): Unit = {
    require(tp.size + fp.size + fn.size < 300000 || m.containsKey(k),
      "evaluate_classifier_predictions: more than 300000 distinct label entries")
    bump(m, k, by)
  }

  def mergeWith(o: EvalPredsBuffer): Unit = {
    o.tp.forEach((k, v) => bumpChecked(tp, k, v))
    o.fp.forEach((k, v) => bumpChecked(fp, k, v))
    o.fn.forEach((k, v) => bumpChecked(fn, k, v))
  }

  // 0/0 ratios format as "NaN%", exactly what the reference's Java
  // format string produces (EvaluateClassifierPredictionsAggregation
  // .java:109,114-116); gate queries must keep every class both
  // predicted and observed, since SQL oracles have no NaN literal text
  def summary: String = {
    val sb = new StringBuilder
    var correct = 0L
    tp.forEach((_, v) => correct += v)
    var wrong = 0L
    fp.forEach((_, v) => wrong += v)
    val total = correct + wrong
    sb.append("Accuracy: %d/%d (%.2f%%)\n".formatLocal(
      java.util.Locale.US, correct, total, 100.0 * correct / total.toDouble))
    val labels = new java.util.TreeSet[String]()
    labels.addAll(tp.keySet()); labels.addAll(fp.keySet()); labels.addAll(fn.keySet())
    labels.forEach { label =>
      val t = Option(tp.get(label)).map(_.longValue()).getOrElse(0L)
      val p = Option(fp.get(label)).map(_.longValue()).getOrElse(0L)
      val n = Option(fn.get(label)).map(_.longValue()).getOrElse(0L)
      sb.append("Class '%s'\n".formatLocal(java.util.Locale.US, label))
      sb.append("Precision: %d/%d (%.2f%%)\n".formatLocal(
        java.util.Locale.US, t, t + p, 100.0 * t / (t + p).toDouble))
      sb.append("Recall: %d/%d (%.2f%%)\n".formatLocal(
        java.util.Locale.US, t, t + n, 100.0 * t / (t + n).toDouble))
    }
    sb.toString
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    def writeMap(m: java.util.TreeMap[String, java.lang.Long]): Unit = {
      out.writeInt(m.size)
      m.forEach { (k, v) => out.writeUTF(k); out.writeLong(v) }
    }
    writeMap(tp); writeMap(fp); writeMap(fn)
    out.flush(); bos.toByteArray
  }
}

object EvalPredsBuffer {
  def deserialize(bytes: Array[Byte]): EvalPredsBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new EvalPredsBuffer
    def readMap(m: java.util.TreeMap[String, java.lang.Long]): Unit = {
      val n = in.readInt()
      var i = 0
      while (i < n) {
        m.put(in.readUTF(), java.lang.Long.valueOf(in.readLong()))
        i += 1
      }
    }
    readMap(buf.tp); readMap(buf.fp); readMap(buf.fn)
    buf
  }
}

case class EvaluatePredictionsAgg(
    truth: Expression,
    prediction: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[EvalPredsBuffer] {

  override def children: Seq[Expression] = Seq(truth, prediction)
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def prettyName: String = "evaluate_classifier_predictions"

  override def createAggregationBuffer(): EvalPredsBuffer = new EvalPredsBuffer

  override def update(buf: EvalPredsBuffer, input: InternalRow): EvalPredsBuffer = {
    val t = truth.eval(input)
    val p = prediction.eval(input)
    if (t != null && p != null) buf.add(t.toString, p.toString)
    buf
  }

  override def merge(buf: EvalPredsBuffer, other: EvalPredsBuffer): EvalPredsBuffer = {
    buf.mergeWith(other); buf
  }

  override def eval(buf: EvalPredsBuffer): Any = UTF8String.fromString(buf.summary)
  override def serialize(buf: EvalPredsBuffer): Array[Byte] = buf.serialize()
  override def deserialize(b: Array[Byte]): EvalPredsBuffer =
    EvalPredsBuffer.deserialize(b)

  override def withNewMutableAggBufferOffset(o: Int): EvaluatePredictionsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): EvaluatePredictionsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): EvaluatePredictionsAgg =
    copy(truth = c(0), prediction = c(1))
}
