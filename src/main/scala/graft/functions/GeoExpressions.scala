package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Geo tier 3 — constructive geometry over WKT strings (reference:
  * presto-geospatial GeoFunctions.java ST_Buffer / ST_ConvexHull /
  * ST_Union / ST_Intersection, which delegate to the Esri geometry
  * kernel). GeoCatalog's tier 1/2 are SQL macros; these four need real
  * algorithms (sort + stack, rectangle decomposition), so they are
  * Catalyst expressions whose generated code calls a static Scala
  * helper — same pattern as [[HyperplaneLsh]], still one virtual call
  * per row inside whole-stage codegen.
  *
  * Scope (documented in SURVEY §7.2): union/intersection operate on the
  * ENVELOPES of their inputs — exact for the axis-aligned-rectangle
  * geometries this tier constructs (st_envelope, bing_tile_polygon,
  * st_buffer bboxes); general polygon overlay stays out of scope.
  * Degenerate convex-hull inputs (<3 distinct non-collinear points)
  * return the input unchanged, like the reference's point/segment
  * passthrough.
  */
object GeoAlgorithms {

  private def fmt(d: Double): String =
    if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString else d.toString

  private[functions] def parseCoords(wkt: String): Array[(Double, Double)] =
    wkt.replaceAll("^[A-Z_ ]+\\(+|\\)+$", "").split(",").iterator
      .map(_.trim).filter(_.nonEmpty).map { c =>
        val parts = c.replaceAll("[()]", "").trim.split("\\s+")
        (parts(0).toDouble, parts(1).toDouble)
      }.toArray

  private def ringWkt(pts: Seq[(Double, Double)]): String =
    pts.map { case (x, y) => s"${fmt(x)} ${fmt(y)}" }.mkString("(", ", ", ")")

  /** Regular n-gon approximation of a point's radius-r disc — the
    * planar analog of Esri's curve densification in ST_Buffer. The
    * closing vertex repeats vertex 0 exactly (no cos(2π) rounding gap). */
  def buffer(pointWkt: String, r: Double, n: Int = 32): String = {
    val Array((x, y)) = parseCoords(pointWkt)
    val verts = (0 until n).map { k =>
      val a = 2.0 * math.Pi * k / n
      (x + r * math.cos(a), y + r * math.sin(a))
    }
    s"POLYGON (${ringWkt(verts :+ verts.head)})"
  }

  /** Andrew's monotone chain (public algorithm), CCW hull, closed ring. */
  def convexHull(wkt: String): String = {
    val pts = parseCoords(wkt).distinct.sortBy(identity)
    if (pts.length < 3) return wkt
    def cross(o: (Double, Double), a: (Double, Double), b: (Double, Double)): Double =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    def half(ps: Seq[(Double, Double)]): List[(Double, Double)] =
      ps.foldLeft(List.empty[(Double, Double)]) { (acc, p) =>
        var h = acc
        while (h.length >= 2 && cross(h(1), h.head, p) <= 0) h = h.tail
        p :: h
      }
    val lower = half(pts.toSeq).reverse.dropRight(1)
    val upper = half(pts.reverse.toSeq).reverse.dropRight(1)
    val hull = lower ++ upper
    if (hull.length < 3) return wkt
    s"POLYGON (${ringWkt(hull :+ hull.head)})"
  }

  private def envelope(wkt: String): (Double, Double, Double, Double) = {
    val pts = parseCoords(wkt)
    (pts.map(_._1).min, pts.map(_._2).min, pts.map(_._1).max, pts.map(_._2).max)
  }

  private def rectWkt(x0: Double, y0: Double, x1: Double, y1: Double): String =
    ringWkt(Seq((x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)))

  /** Envelope intersection: rectangle or POLYGON EMPTY. */
  def intersection(a: String, b: String): String = {
    val (ax0, ay0, ax1, ay1) = envelope(a)
    val (bx0, by0, bx1, by1) = envelope(b)
    val (x0, y0) = (math.max(ax0, bx0), math.max(ay0, by0))
    val (x1, y1) = (math.min(ax1, bx1), math.min(ay1, by1))
    if (x0 >= x1 || y0 >= y1) "POLYGON EMPTY"
    else s"POLYGON (${rectWkt(x0, y0, x1, y1)})"
  }

  /** Envelope union as a DISJOINT rectangle decomposition: A plus the
    * up-to-4 strips of B \ A — so the multipolygon's summed area is the
    * true union area (area(A) + area(B) − area(A∩B)), never
    * double-counted. Single-rectangle results collapse to POLYGON. */
  def union(a: String, b: String): String = {
    val (ax0, ay0, ax1, ay1) = envelope(a)
    val (bx0, by0, bx1, by1) = envelope(b)
    val overlaps = math.max(ax0, bx0) < math.min(ax1, bx1) &&
      math.max(ay0, by0) < math.min(ay1, by1)
    val parts: Seq[(Double, Double, Double, Double)] =
      if (!overlaps) Seq((ax0, ay0, ax1, ay1), (bx0, by0, bx1, by1))
      else {
        // B \ A: left and right full-height strips, then middle top/bottom
        val mx0 = math.max(bx0, ax0)
        val mx1 = math.min(bx1, ax1)
        Seq((ax0, ay0, ax1, ay1)) ++ Seq(
          (bx0, by0, math.min(bx1, ax0), by1),            // left of A
          (math.max(bx0, ax1), by0, bx1, by1),            // right of A
          (mx0, math.max(by0, ay1), mx1, by1),            // above A
          (mx0, by0, mx1, math.min(by1, ay0))             // below A
        ).filter(r => r._1 < r._3 && r._2 < r._4)
      }
    if (parts.length == 1) {
      val p = parts.head
      s"POLYGON (${rectWkt(p._1, p._2, p._3, p._4)})"
    } else
      parts.map(p => s"(${rectWkt(p._1, p._2, p._3, p._4)})")
        .mkString("MULTIPOLYGON (", ", ", ")")
  }

  /** Shoelace area summed over every ring of a POLYGON / MULTIPOLYGON —
    * the multi-part-aware sibling of the single-ring st_area macro. */
  def area(wkt: String): Double = {
    if (wkt.endsWith("EMPTY")) return 0.0
    "\\(([^()]+)\\)".r.findAllMatchIn(wkt).map { m =>
      val ring = m.group(1).split(",").map { c =>
        val p = c.trim.split("\\s+")
        (p(0).toDouble, p(1).toDouble)
      }
      math.abs((0 until ring.length - 1).map(i =>
        ring(i)._1 * ring(i + 1)._2 - ring(i + 1)._1 * ring(i)._2).sum) / 2.0
    }.sum
  }
}

private[functions] trait WktStaticCall { self: Expression =>
  override def dataType: DataType = StringType
}

case class StBuffer(left: Expression, right: Expression)
  extends BinaryExpression with WktStaticCall {
  override def prettyName: String = "st_buffer"
  override def nullSafeEval(g: Any, r: Any): Any =
    UTF8String.fromString(
      GeoAlgorithms.buffer(g.asInstanceOf[UTF8String].toString,
        r.asInstanceOf[Double]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, r) =>
      s"""org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.GeoAlgorithms.buffer($g.toString(), $r, 32))""".stripMargin)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StBuffer =
    copy(left = l, right = r)
}

case class StConvexHull(child: Expression)
  extends UnaryExpression with WktStaticCall {
  override def prettyName: String = "st_convex_hull"
  override def nullSafeEval(g: Any): Any =
    UTF8String.fromString(
      GeoAlgorithms.convexHull(g.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g =>
      s"""org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.GeoAlgorithms.convexHull($g.toString()))""".stripMargin)
  override protected def withNewChildInternal(c: Expression): StConvexHull =
    copy(child = c)
}

case class StUnion(left: Expression, right: Expression)
  extends BinaryExpression with WktStaticCall {
  override def prettyName: String = "st_union"
  override def nullSafeEval(a: Any, b: Any): Any =
    UTF8String.fromString(GeoAlgorithms.union(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"""org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.GeoAlgorithms.union($a.toString(), $b.toString()))""".stripMargin)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StUnion =
    copy(left = l, right = r)
}

case class StIntersection(left: Expression, right: Expression)
  extends BinaryExpression with WktStaticCall {
  override def prettyName: String = "st_intersection"
  override def nullSafeEval(a: Any, b: Any): Any =
    UTF8String.fromString(GeoAlgorithms.intersection(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"""org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.GeoAlgorithms.intersection($a.toString(), $b.toString()))""".stripMargin)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StIntersection =
    copy(left = l, right = r)
}

/** Multi-part-aware area (the st_area macro handles one ring). */
case class GeomArea(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "geom_area"
  override def nullSafeEval(g: Any): Any =
    GeoAlgorithms.area(g.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g =>
      s"graft.functions.GeoAlgorithms.area($g.toString())")
  override protected def withNewChildInternal(c: Expression): GeomArea =
    copy(child = c)
}
