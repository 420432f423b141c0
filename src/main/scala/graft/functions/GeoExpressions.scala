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
  * Scope (documented in SURVEY §7.2): st_intersection is EXACT for
  * convex x convex polygon pairs (Sutherland-Hodgman clip — covers
  * every rectangle, triangle, buffer n-gon, and tile box this tier
  * constructs) with an envelope fallback for non-convex inputs;
  * st_union/st_difference stay envelope-scope, and general non-convex
  * polygon overlay stays out of scope.
  * Degenerate convex-hull inputs (<3 distinct non-collinear points)
  * return the input unchanged, like the reference's point/segment
  * passthrough.
  */
object GeoAlgorithms {

  private[functions] def fmt(d: Double): String =
    if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString else d.toString

  private[functions] def geomType(wkt: String): String =
    wkt.takeWhile(c => c != ' ' && c != '(')

  /** Per-ring coordinate parse — one entry per paren group, so ring
    * boundaries are preserved (parseCoords flattens them). */
  def parseRings(wkt: String): Seq[Array[(Double, Double)]] =
    "\\(([^()]+)\\)".r.findAllMatchIn(wkt).map { m =>
      m.group(1).split(",").map { c =>
        val p = c.trim.split("\\s+")
        (p(0).toDouble, p(1).toDouble)
      }
    }.toSeq

  def parseCoords(wkt: String): Array[(Double, Double)] =
    if (wkt.trim.endsWith("EMPTY")) Array.empty
    else wkt.trim.replaceAll("^[A-Z_ ]+\\(+|\\)+$", "").split(",").iterator
      .map(_.replaceAll("[()]", "").trim)
      // collection members carry their own type keyword ('POINT 1 2')
      // and may themselves be EMPTY ('POINT EMPTY' → no coords)
      .map(_.replaceAll("^[A-Za-z_ ]+", "").trim)
      .filter(_.nonEmpty).map { c =>
        val parts = c.split("\\s+")
        (parts(0).toDouble, parts(1).toDouble)
      }.toArray

  private[functions] def ringWkt(pts: Seq[(Double, Double)]): String =
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

  /** Andrew's monotone chain (public algorithm): hull vertices in CCW
    * order starting from the lexicographic minimum — deterministic for
    * a given point SET, independent of input order. Degenerate sets
    * come back as-is (< 3 distinct points) or as the two collinear
    * extremes, never as a 2D ring. */
  private[functions] def hullPoints(ptsIn: Seq[(Double, Double)]): Seq[(Double, Double)] = {
    val pts = ptsIn.distinct.sortBy(identity)
    if (pts.length < 3) return pts
    def cross(o: (Double, Double), a: (Double, Double), b: (Double, Double)): Double =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    def half(ps: Seq[(Double, Double)]): List[(Double, Double)] =
      ps.foldLeft(List.empty[(Double, Double)]) { (acc, p) =>
        var h = acc
        while (h.length >= 2 && cross(h(1), h.head, p) <= 0) h = h.tail
        p :: h
      }
    val lower = half(pts).reverse.dropRight(1)
    val upper = half(pts.reverse).reverse.dropRight(1)
    val hull = lower ++ upper
    if (hull.length < 3) Seq(pts.head, pts.last) else hull
  }

  /** Andrew's monotone chain (public algorithm), CCW hull, closed ring. */
  def convexHull(wkt: String): String = {
    val pts = parseCoords(wkt).toSeq
    val hull = hullPoints(pts)
    if (hull.length < 3) return wkt
    s"POLYGON (${ringWkt(hull :+ hull.head)})"
  }

  private[functions] def envelope(wkt: String): (Double, Double, Double, Double) = {
    val pts = parseCoords(wkt)
    (pts.map(_._1).min, pts.map(_._2).min, pts.map(_._1).max, pts.map(_._2).max)
  }

  /** None for geometries with no coordinates (POINT EMPTY,
    * GEOMETRYCOLLECTION (POINT EMPTY), ...) — mirrors the reference's
    * deserializeEnvelope == null branch rather than a textual
    * endsWith("EMPTY") heuristic. */
  private[functions] def envelopeOpt(wkt: String): Option[(Double, Double, Double, Double)] = {
    val pts = parseCoords(wkt)
    if (pts.isEmpty) None
    else Some((pts.map(_._1).min, pts.map(_._2).min, pts.map(_._1).max, pts.map(_._2).max))
  }

  private def rectWkt(x0: Double, y0: Double, x1: Double, y1: Double): String =
    ringWkt(Seq((x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)))

  /** True when the closed ring is convex (all cross products one
    * sign, zeros allowed for collinear vertices). */
  private def isConvexRing(ring: Array[(Double, Double)]): Boolean = {
    val pts = if (ring.length > 1 && ring.head == ring.last) ring.dropRight(1) else ring
    if (pts.length < 3) return false
    var sign = 0.0
    for (i <- pts.indices) {
      val o = pts(i); val p = pts((i + 1) % pts.length); val q = pts((i + 2) % pts.length)
      val c = (p._1 - o._1) * (q._2 - o._2) - (p._2 - o._2) * (q._1 - o._1)
      if (c != 0.0) {
        if (sign == 0.0) sign = math.signum(c)
        else if (math.signum(c) != sign) return false
      }
    }
    true
  }

  /** Sutherland–Hodgman clipping of a convex subject by a convex clip
    * polygon (public algorithm): clip edge by edge, keeping points on
    * the interior side and inserting edge intersections. */
  private def clipConvex(subject: Array[(Double, Double)],
      clip: Array[(Double, Double)]): Array[(Double, Double)] = {
    def open(r: Array[(Double, Double)]) =
      if (r.length > 1 && r.head == r.last) r.dropRight(1) else r
    val clipPts = open(clip)
    // orient the clip ring CCW so "inside" is a consistent left-test
    val signedArea = clipPts.indices.map { i =>
      val p = clipPts(i); val q = clipPts((i + 1) % clipPts.length)
      p._1 * q._2 - q._1 * p._2
    }.sum
    val ccw = if (signedArea >= 0) clipPts else clipPts.reverse
    var out = open(subject).toVector
    for (i <- ccw.indices if out.nonEmpty) {
      val e1 = ccw(i); val e2 = ccw((i + 1) % ccw.length)
      def inside(p: (Double, Double)): Boolean =
        (e2._1 - e1._1) * (p._2 - e1._2) - (e2._2 - e1._2) * (p._1 - e1._1) >= 0
      def meet(p: (Double, Double), q: (Double, Double)): (Double, Double) = {
        val (x1, y1) = p; val (x2, y2) = q
        val (x3, y3) = e1; val (x4, y4) = e2
        val den = (x1 - x2) * (y3 - y4) - (y1 - y2) * (x3 - x4)
        val t = ((x1 - x3) * (y3 - y4) - (y1 - y3) * (x3 - x4)) / den
        (x1 + t * (x2 - x1), y1 + t * (y2 - y1))
      }
      val in = out
      out = Vector.empty
      for (j <- in.indices) {
        val cur = in(j); val prev = in((j + in.length - 1) % in.length)
        if (inside(cur)) {
          if (!inside(prev)) out :+= meet(prev, cur)
          out :+= cur
        } else if (inside(prev)) out :+= meet(prev, cur)
      }
    }
    out.distinct.toArray
  }

  private def openRing(r: Array[(Double, Double)]): Array[(Double, Double)] =
    if (r.length > 1 && r.head == r.last) r.dropRight(1) else r

  private def closedRing(r: Array[(Double, Double)]): Array[(Double, Double)] =
    if (r.length > 1 && r.head == r.last) r else r :+ r.head

  /** |shoelace|/2 over one ring (open or closed). */
  private def ringArea(ring: Array[(Double, Double)]): Double = {
    val p = openRing(ring)
    if (p.length < 3) return 0.0
    math.abs(p.indices.map { i =>
      val u = p(i); val v = p((i + 1) % p.length)
      u._1 * v._2 - v._1 * u._2
    }.sum) / 2.0
  }

  /** ST_Intersection: EXACT Sutherland–Hodgman clip when both inputs
    * are SINGLE-RING convex polygons; holed inputs route to the exact
    * subdivision overlay (r8), non-convex degenerate pairs to the
    * documented envelope fallback. EMPTY inputs — which this function
    * itself produces — intersect to EMPTY, so the overlay functions
    * compose. */
  def intersection(a: String, b: String): String = {
    if (a.endsWith("EMPTY") || b.endsWith("EMPTY")) return "POLYGON EMPTY"
    // MULTIPOLYGON rides the exact subdivision overlay too (r9)
    if (Seq(a, b).forall(w => geomType(w) == "POLYGON" || geomType(w) == "MULTIPOLYGON")) {
      val ringsA = parseRings(a)
      val ringsB = parseRings(b)
      // convex fast path is single-ring only: clipping each hole into
      // the result separately double-subtracts wherever holes from the
      // two sides overlap — hole-y inputs take the exact subdivision
      // overlay below (r8)
      if (ringsA.length == 1 && ringsB.length == 1 &&
        (ringsA ++ ringsB).forall(isConvexRing)) {
        val clipped = clipConvex(ringsA.head, ringsB.head)
        if (clipped.length < 3) return "POLYGON EMPTY"
        val outer = closedRing(clipped)
        return s"POLYGON (${ringWkt(outer.toSeq)})"
      }
      // r4 late: exact concave regime — Greiner–Hormann in general
      // position (single-ring simple pairs); degeneracy falls through
      overlayExact(a, b, "intersection") match {
        case Some(w) => return w
        case None =>
      }
    }
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
    if (a.endsWith("EMPTY")) return b
    if (b.endsWith("EMPTY")) return a
    // r4 late: exact dissolve for non-rectangle simple pairs in general
    // position (Greiner–Hormann). Axis-rectangle pairs keep the
    // canonical disjoint rectangle decomposition shared with
    // geometry_union / geometry_union_agg; degeneracy falls through to
    // the envelope decomposition.
    if (!(isAxisRect(a) && isAxisRect(b))) {
      overlayExact(a, b, "union") match {
        case Some(w) => return w
        case None =>
      }
    }
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

  /** Ray cast (odd crossings = inside) — the SAME arithmetic as the
    * original st_contains macro, but in one tight loop: the macro's
    * transform/aggregate lambdas run interpreted (~11 µs/test), which
    * made the predicate the whole cost of the broadcast-NL spatial
    * join. Ring parse is memoized per polygon text — the build side of
    * a spatial join repeats a small polygon set millions of times. */
  // thread-local: an access-ordered LRU's get() is a structural
  // mutation, so a shared synchronized map would put one global lock
  // on the per-row hot path of the broadcast-NL spatial join; a
  // per-task-thread cache keeps the memoization contention-free
  // (32 threads x 1024 small entries is negligible memory)
  private val ringCache =
    ThreadLocal.withInitial[java.util.LinkedHashMap[String, Array[(Double, Double)]]](
      () => new java.util.LinkedHashMap[String, Array[(Double, Double)]](64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Array[(Double, Double)]]): Boolean =
          size() > 1024
      })

  def containsPoint(polyWkt: String, px: Double, py: Double): Boolean = {
    if (polyWkt.endsWith("EMPTY")) return false
    val cache = ringCache.get()
    var r = cache.get(polyWkt)
    if (r == null) { r = parseCoords(polyWkt); cache.put(polyWkt, r) }
    var crossings = 0
    var i = 0
    while (i < r.length - 1) {
      val (x1, y1) = r(i)
      val (x2, y2) = r(i + 1)
      if (((y1 > py) != (y2 > py)) &&
        (px < (x2 - x1) * (py - y1) / (y2 - y1) + x1)) crossings += 1
      i += 1
    }
    (crossings & 1) == 1
  }

  def containsPointWkt(polyWkt: String, ptWkt: String): Boolean = {
    val p = parseCoords(ptWkt)
    containsPoint(polyWkt, p(0)._1, p(0)._2)
  }

  /** Top-level member WKTs of a GEOMETRYCOLLECTION (split at depth-0
    * commas; members keep their own type keyword). */
  private[functions] def collectionMembers(wkt: String): Seq[String] = {
    val body = wkt.trim.stripPrefix("GEOMETRYCOLLECTION").trim
    if (body == "EMPTY") return Seq.empty
    val inner = body.stripPrefix("(").stripSuffix(")")
    val out = Seq.newBuilder[String]
    var depth = 0; var start = 0
    var i = 0
    while (i < inner.length) {
      inner.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 =>
          out += inner.substring(start, i).trim; start = i + 1
        case _ =>
      }
      i += 1
    }
    out += inner.substring(start).trim
    out.result().filter(_.nonEmpty)
  }

  /** Flatten nested collections to their simple-geometry members. */
  private[functions] def flattenCollection(wkt: String): Seq[String] =
    if (geomType(wkt) != "GEOMETRYCOLLECTION") Seq(wkt)
    else collectionMembers(wkt).flatMap(flattenCollection)

  /** ST_Contains for ANY supported operand pair (r9). POINT right
    * operands keep the ray-cast fast path — it is the spatial-join
    * hot path and containsPoint is branch-free per edge; every other
    * regime decides the OGC pattern "T*****FF*" from the exact DE-9IM
    * matrix (reference GeoFunctions.java stContains delegates the
    * same way to its relate operator). GEOMETRYCOLLECTION operands
    * (r10) decompose to their members; regimes the matrix cannot
    * answer RAISE — the pre-r10 first-vertex fallback could silently
    * return true for a geometry that is not contained. */
  def containsGeom(a: String, b: String): Boolean = {
    if (a.endsWith("EMPTY") || b.endsWith("EMPTY")) return false
    if (geomType(a) == "GEOMETRYCOLLECTION" || geomType(b) == "GEOMETRYCOLLECTION")
      return containsCollection(a, b)
    if (geomType(b) == "POINT") return containsPointWkt(a, b)
    tryRelate(a, b) match {
      case Some(m) => m(0) != 'F' && m(6) == 'F' && m(7) == 'F'
      case None => throw new IllegalArgumentException(
        s"st_contains: unsupported geometry regime " +
          s"(${geomType(a)}, ${geomType(b)})")
    }
  }

  /** st_contains with a GEOMETRYCOLLECTION on either side, by member
    * decomposition. Right collection: contained iff every member avoids
    * A's exterior (EI and EB cells both F) and some member's interior
    * meets A's interior. Left collection: a single member containing B
    * decides true; B meeting no member (or exactly one, which was just
    * shown not to contain it) decides false; B spanning several
    * members raises — the union's interior is not derivable from
    * per-member matrices, and a guess would be a silent wrong answer. */
  private def containsCollection(a: String, b: String): Boolean = {
    if (geomType(b) == "GEOMETRYCOLLECTION") {
      val ms = flattenCollection(b).filterNot(_.endsWith("EMPTY"))
      if (ms.isEmpty) return false
      if (geomType(a) == "GEOMETRYCOLLECTION")
        return ms.forall(m => containsGeom(a, m)) // recurses into left-collection case
      val rels = ms.map(m => relateMatrix(a, m))
      return rels.forall(r => r(6) == 'F' && r(7) == 'F') &&
        rels.exists(_(0) != 'F')
    }
    val ms = flattenCollection(a).filterNot(_.endsWith("EMPTY"))
    if (ms.exists(m => containsGeom(m, b))) return true
    def envTouches(m: String): Boolean =
      (envelopeOpt(m), envelopeOpt(b)) match {
        case (Some((ax0, ay0, ax1, ay1)), Some((bx0, by0, bx1, by1))) =>
          ax0 <= bx1 && bx0 <= ax1 && ay0 <= by1 && by0 <= ay1
        case _ => false
      }
    if (ms.count(envTouches) <= 1) false
    else throw new IllegalArgumentException(
      "st_contains: GEOMETRYCOLLECTION left operand whose members jointly " +
        "cover the right operand is not supported")
  }

  // --- topology / overlay / serialization tier -----------------------

  /** True when segments (p1,p2) and (p3,p4) properly cross (strict
    * double-orientation test — shared endpoints don't count). */
  private def properCross(p1: (Double, Double), p2: (Double, Double),
      p3: (Double, Double), p4: (Double, Double)): Boolean = {
    val d1 = orient(p3, p4, p1); val d2 = orient(p3, p4, p2)
    val d3 = orient(p1, p2, p3); val d4 = orient(p1, p2, p4)
    ((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
      ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))
  }

  private def orient(o: (Double, Double), a: (Double, Double), b: (Double, Double)): Double =
    (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)

  /** Scale of the incidence tolerance below. Matches nearPt/GhSnap
    * (1e-9): a point computed with rounding is "on" a boundary when it
    * is within 1e-9·scale of it.
    */
  private val SegEps = 1e-9

  /** p lies on segment (s1, s2) within an eps scaled to the segment.
    *
    * NOT an exact orient == 0 test (r9, ADVICE): the points classified
    * here in the relate paths — refined split points and sub-segment
    * midpoints from splitSegInto/refinePolyline — are computed with
    * rounding, so exact float predicates silently miss collinearity on
    * non-axis-aligned boundaries and emit wrong DE-9IM cells.
    */
  private def onSegment(p: (Double, Double), s1: (Double, Double),
      s2: (Double, Double)): Boolean = {
    val dx = s2._1 - s1._1; val dy = s2._2 - s1._2
    val len2 = dx * dx + dy * dy
    if (len2 == 0.0) return nearPt(p, s1)
    val len = math.sqrt(len2)
    val tol = SegEps * math.max(1.0, len)
    // |orient| = perpendicular distance × segment length
    if (math.abs(orient(s1, s2, p)) > tol * len) return false
    val t = ((p._1 - s1._1) * dx + (p._2 - s1._2) * dy) / len2
    t >= -tol / len && t <= 1.0 + tol / len
  }

  /** OGC ST_Crosses (GeoFunctions.java stCrosses) for the line/line
    * and line/polygon regimes. Line/line: interiors share a point —
    * a proper segment crossing, or a vertex of one line lying on the
    * other — and that point is not a terminal endpoint of either line
    * (terminal meets are `touches`); collinear-overlap pairs (1-dim
    * meet) are excluded. Line/polygon: the line properly crosses a
    * ring edge, or has sampled points both strictly inside and
    * strictly outside. Point/point and polygon/polygon pairs can
    * never satisfy the dimension rule
    * (dim(intersection) < max(dim a, dim b)) in these regimes. */
  /** Topological dimension of a WKT type. */
  private def dimOf(t: String): Int = t match {
    case "POINT" | "MULTIPOINT" => 0
    case "LINESTRING" | "MULTILINESTRING" => 1
    case _ => 2
  }

  /** relateMatrix where the regime is supported, None otherwise — the
    * boolean predicates (r9) decide from the exact DE-9IM matrix first
    * and keep their documented envelope-scope fallbacks only for
    * regimes relate cannot answer (e.g. GEOMETRYCOLLECTION, degenerate
    * non-simple polygons). */
  private def tryRelate(a: String, b: String): Option[String] =
    try Some(relateMatrix(a, b)) catch { case _: Exception => None }

  def crosses(a: String, b: String): Boolean = {
    if (a.endsWith("EMPTY") || b.endsWith("EMPTY")) return false
    // OGC: dim(a)<dim(b) → "T*T******"; dim(a)>dim(b) → "T*****T**";
    // two lines → "0********"; equal dims 0/2 never cross
    tryRelate(a, b) match {
      case Some(m) =>
        val da = dimOf(geomType(a)); val db = dimOf(geomType(b))
        return if (da < db) m(0) != 'F' && m(2) != 'F'
        else if (da > db) m(0) != 'F' && m(6) != 'F'
        else da == 1 && m(0) == '0'
      case None =>
    }
    (geomType(a), geomType(b)) match {
      case ("LINESTRING", "LINESTRING") =>
        val pa = parseCoords(a); val pb = parseCoords(b)
        val proper = (0 until pa.length - 1).exists(i =>
          (0 until pb.length - 1).exists(j =>
            properCross(pa(i), pa(i + 1), pb(j), pb(j + 1))))
        // vertex-on-interior meet: a vertex of one line sits on a
        // NON-collinear segment of the other, away from both lines'
        // terminal endpoints (those are boundary → touches, not
        // crosses); requiring non-collinear adjacent segments drops
        // 1-dim overlap meets, which OGC excludes from crosses
        def vertexMeet(va: Array[(Double, Double)], vb: Array[(Double, Double)]): Boolean =
          va.indices.exists { i =>
            val v = va(i)
            v != va.head && v != va.last &&
              v != vb.head && v != vb.last &&
              (0 until vb.length - 1).exists { j =>
                val (c, d) = (vb(j), vb(j + 1))
                onSegment(v, c, d) && {
                  // skip when an adjacent segment of v runs along
                  // (c,d): that meet is 1-dim overlap, not a crossing
                  val prevColl = i > 0 && orient(c, d, va(i - 1)) == 0.0
                  val nextColl = i < va.length - 1 && orient(c, d, va(i + 1)) == 0.0
                  !prevColl && !nextColl
                }
              }
          }
        proper || vertexMeet(pa, pb) || vertexMeet(pb, pa)
      case ("LINESTRING", "POLYGON") => lineCrossesPoly(a, b)
      case ("POLYGON", "LINESTRING") => lineCrossesPoly(b, a)
      case _ => false
    }
  }

  private def lineCrossesPoly(line: String, poly: String): Boolean = {
    val pts = parseCoords(line)
    // a segment properly crossing any ring edge puts line-interior
    // points on both sides of the boundary — crosses regardless of
    // where the segment's endpoints sample
    val ring = parseCoords(poly)
    val edgeCross = (0 until pts.length - 1).exists(i =>
      (0 until ring.length - 1).exists(j =>
        properCross(pts(i), pts(i + 1), ring(j), ring(j + 1))))
    if (edgeCross) return true
    // grazing fallback: vertex/midpoint samples strictly in and out
    val samples = pts ++ (0 until pts.length - 1).map(i =>
      ((pts(i)._1 + pts(i + 1)._1) / 2, (pts(i)._2 + pts(i + 1)._2) / 2))
    samples.exists(p => containsPoint(poly, p._1, p._2)) &&
      samples.exists(p => !containsPoint(poly, p._1, p._2))
  }

  /** ST_IsSimple / ST_IsValid for this tier: no zero-length segment, no
    * repeated vertex (polygon closure excepted), no proper
    * self-crossing between non-adjacent segments. */
  def isSimple(wkt: String): Boolean = {
    if (wkt.endsWith("EMPTY")) return true
    val t = geomType(wkt)
    if (t == "POINT") return true
    val raw = parseCoords(wkt)
    if (t == "MULTIPOINT") return raw.distinct.length == raw.length
    // a POLYGON ring and a closed LINESTRING both repeat the first
    // vertex as closure — that repeat is not a simplicity violation
    val ring = t == "POLYGON" ||
      (raw.length > 1 && raw.head == raw.last)
    val pts = if (ring) raw.dropRight(1) else raw
    if (pts.distinct.length != pts.length) return false
    val segs = (if (ring) pts.toSeq :+ pts.head else pts.toSeq)
      .sliding(2).filter(_.length == 2).map(s => (s(0), s(1))).toArray
    var i = 0
    while (i < segs.length) {
      var j = i + 2
      val jMax = if (ring && i == 0) segs.length - 1 else segs.length
      while (j < jMax) {
        if (properCross(segs(i)._1, segs(i)._2, segs(j)._1, segs(j)._2)) return false
        j += 1
      }
      i += 1
    }
    true
  }

  /** ST_Equals for this tier: same type and same coordinate sequence —
    * linestrings up to reversal, polygon rings up to rotation and
    * direction (topological equality beyond vertex permutation, e.g.
    * redundant collinear vertices, is out of scope, as documented). */
  def equalsGeom(a: String, b: String): Boolean = {
    val (ta, tb) = (geomType(a), geomType(b))
    if (ta != tb) return false
    val (ca, cb) = (parseCoords(a), parseCoords(b))
    ta match {
      case "POINT" => ca.sameElements(cb)
      case "MULTIPOINT" => ca.sorted.sameElements(cb.sorted)
      case "LINESTRING" => ca.sameElements(cb) || ca.reverse.sameElements(cb)
      case "POLYGON" =>
        val ra = ca.dropRight(1).toSeq
        val rb = cb.dropRight(1).toSeq
        ra.length == rb.length && {
          val rots = (0 until ra.length).map(k => ra.drop(k) ++ ra.take(k))
          rots.exists(r => r == rb || r.reverse == rb)
        }
      case _ => a == b
    }
  }

  /** Ramer–Douglas–Peucker (public algorithm) over linestrings and
    * polygon rings — ST_Simplify. */
  def simplify(wkt: String, tol: Double): String = {
    val t = geomType(wkt)
    if (t != "LINESTRING" && t != "POLYGON") return wkt
    def dp(pts: Vector[(Double, Double)]): Vector[(Double, Double)] = {
      if (pts.length < 3) return pts
      val (x1, y1) = pts.head
      val (x2, y2) = pts.last
      val len = math.hypot(x2 - x1, y2 - y1)
      var maxD = -1.0
      var maxI = 0
      var i = 1
      while (i < pts.length - 1) {
        val (x0, y0) = pts(i)
        val d =
          if (len == 0) math.hypot(x0 - x1, y0 - y1)
          else math.abs((x2 - x1) * (y1 - y0) - (x1 - x0) * (y2 - y1)) / len
        if (d > maxD) { maxD = d; maxI = i }
        i += 1
      }
      if (maxD <= tol) Vector(pts.head, pts.last)
      else dp(pts.take(maxI + 1)) ++ dp(pts.drop(maxI)).tail
    }
    val pts = parseCoords(wkt).toVector
    if (t == "LINESTRING")
      s"LINESTRING ${ringWkt(dp(pts))}"
    else {
      val ring = dp(pts)
      if (ring.length < 4) wkt else s"POLYGON (${ringWkt(ring)})"
    }
  }

  private[functions] type Rect = (Double, Double, Double, Double)

  /** Parts of rectangle `r` outside rectangle `c` (≤ 4 disjoint strips). */
  private[functions] def rectMinus(r: Rect, c: Rect): Seq[Rect] = {
    val (rx0, ry0, rx1, ry1) = r
    val (cx0, cy0, cx1, cy1) = c
    val overlaps = math.max(rx0, cx0) < math.min(rx1, cx1) &&
      math.max(ry0, cy0) < math.min(ry1, cy1)
    if (!overlaps) Seq(r)
    else {
      val mx0 = math.max(rx0, cx0)
      val mx1 = math.min(rx1, cx1)
      Seq(
        (rx0, ry0, math.min(rx1, cx0), ry1),
        (math.max(rx0, cx1), ry0, rx1, ry1),
        (mx0, math.max(ry0, cy1), mx1, ry1),
        (mx0, ry0, mx1, math.min(ry1, cy0))
      ).filter(p => p._1 < p._3 && p._2 < p._4)
    }
  }

  private[functions] def partsWkt(parts: Seq[Rect]): String =
    if (parts.isEmpty) "POLYGON EMPTY"
    else if (parts.length == 1) {
      val p = parts.head
      s"POLYGON (${rectWkt(p._1, p._2, p._3, p._4)})"
    } else
      parts.map(p => s"(${rectWkt(p._1, p._2, p._3, p._4)})")
        .mkString("MULTIPOLYGON (", ", ", ")")

  /** ST_Difference. Hole-aware exact case (r4): when both are convex
    * POLYGONs and B lies wholly inside A's outer ring, A − B is A with
    * B appended as one more interior ring (disjoint from A's existing
    * holes, the fixtures' regime — geom_area then subtracts exactly);
    * B covering A yields EMPTY; B disjoint from A returns A unchanged.
    * Other shapes keep the envelope-scope rectangle decomposition. */
  def difference(a: String, b: String): String = {
    if (a.endsWith("EMPTY")) return "POLYGON EMPTY"
    if (b.endsWith("EMPTY")) return a
    // MULTIPOLYGON rides the exact subdivision overlay too (r9)
    if (Seq(a, b).forall(w => geomType(w) == "POLYGON" || geomType(w) == "MULTIPOLYGON")) {
      val ringsA = parseRings(a)
      val ringsB = parseRings(b)
      val outerB = ringsB.head
      // single-ring-only fast path: appending B as one more hole is
      // wrong when A's existing holes overlap B (double-subtraction),
      // and ignores B's own holes — hole-y inputs take the exact
      // subdivision overlay below (r8)
      if (ringsA.length == 1 && ringsB.length == 1 &&
        (ringsA :+ outerB).forall(isConvexRing)) {
        val outerA = closedRing(ringsA.head)
        val bIn = clipConvex(outerB, outerA)
        if (bIn.length < 3) return a // B outside A's outer ring
        val aIn = clipConvex(ringsA.head, closedRing(outerB))
        val areaA = ringArea(ringsA.head)
        if (math.abs(ringArea(aIn) - areaA) <= 1e-9 * math.max(1.0, areaA))
          return "POLYGON EMPTY" // B covers A
        val areaB = ringArea(outerB)
        if (math.abs(ringArea(bIn) - areaB) <= 1e-9 * math.max(1.0, areaB)) {
          val rings = (outerA.toSeq +:
            ringsA.tail.map(h => closedRing(h).toSeq)) :+ closedRing(bIn).toSeq
          return s"POLYGON (${rings.map(ringWkt).mkString(", ")})"
        }
      }
      // r4 late: exact crossing regime, concave included (Greiner–
      // Hormann, general position); degeneracy falls through
      overlayExact(a, b, "difference") match {
        case Some(w) => return w
        case None =>
      }
    }
    partsWkt(rectMinus(envelope(a), envelope(b)))
  }

  // --- DE-9IM relate (ST_Relate, GeoFunctions.java:1078) ---------------

  private def pointInRing(ring: Array[(Double, Double)], px: Double, py: Double): Boolean = {
    var crossings = 0
    var i = 0
    while (i < ring.length - 1) {
      val (x1, y1) = ring(i)
      val (x2, y2) = ring(i + 1)
      if (((y1 > py) != (y2 > py)) &&
        (px < (x2 - x1) * (py - y1) / (y2 - y1) + x1)) crossings += 1
      i += 1
    }
    (crossings & 1) == 1
  }

  /** p lies on segment (s1, s2), endpoints included — eps-tolerant
    * like onSegment (exact tuple equality would miss computed points,
    * r9 ADVICE). */
  private def ptOnSeg(p: (Double, Double), s1: (Double, Double),
      s2: (Double, Double)): Boolean =
    nearPt(p, s1) || nearPt(p, s2) || onSegment(p, s1, s2)

  private def onRingBoundary(ring: Array[(Double, Double)], p: (Double, Double)): Boolean =
    (0 until ring.length - 1).exists(i => ptOnSeg(p, ring(i), ring(i + 1)))

  /** Dimension of the contact between two closed rings' boundaries:
    * 1 = collinear segment overlap, 0 = point contact, -1 = none. */
  private def boundaryContactDim(ra: Array[(Double, Double)],
      rb: Array[(Double, Double)]): Int = {
    var dim = -1
    for (i <- 0 until ra.length - 1; j <- 0 until rb.length - 1) {
      val (s1, s2) = (ra(i), ra(i + 1))
      val (t1, t2) = (rb(j), rb(j + 1))
      // eps-tolerant collinearity (r9 ADVICE — edges may carry computed
      // endpoints): t within SegEps·scale of the supporting line of s
      val sLen = math.hypot(s2._1 - s1._1, s2._2 - s1._2)
      val lineTol = SegEps * math.max(1.0, sLen) * math.max(sLen, 1.0)
      if (sLen > 0.0 && math.abs(orient(s1, s2, t1)) <= lineTol &&
        math.abs(orient(s1, s2, t2)) <= lineTol) {
        // collinear: positive-length interval overlap on the longer axis
        val horiz = math.abs(s2._1 - s1._1) >= math.abs(s2._2 - s1._2)
        def ax(p: (Double, Double)) = if (horiz) p._1 else p._2
        val lo = math.max(math.min(ax(s1), ax(s2)), math.min(ax(t1), ax(t2)))
        val hi = math.min(math.max(ax(s1), ax(s2)), math.max(ax(t1), ax(t2)))
        val axTol = SegEps * math.max(1.0, math.max(math.abs(hi), math.abs(lo)))
        if (hi > lo + axTol) return 1
        if (hi >= lo - axTol) dim = math.max(dim, 0)
      } else if (properCross(s1, s2, t1, t2) ||
        ptOnSeg(t1, s1, s2) || ptOnSeg(t2, s1, s2) ||
        ptOnSeg(s1, t1, t2) || ptOnSeg(s2, t1, t2)) dim = math.max(dim, 0)
    }
    dim
  }

  private def transposeMatrix(m: String): String =
    new String(Array(m(0), m(3), m(6), m(1), m(4), m(7), m(2), m(5), m(8)))

  /** ST_Relate's DE-9IM matrix [II IB IE / BI BB BE / EI EB EE].
    * Since r9 every pairing of {POINT, MULTIPOINT, LINESTRING,
    * MULTILINESTRING, POLYGON, MULTIPOLYGON} is computed: point sets
    * classify per-point, line sets mutually refine with the OGC mod-2
    * boundary rule, and polygon pairs (concave, holed, multi-part,
    * boundary-tangent) take interior terms from the exact
    * subdivision-overlay intersection area and boundary terms from
    * midpoint classification of each boundary against the other
    * operand. The canonical matrices are standard OGC SFS facts. */
  def relateMatrix(a: String, b: String): String = {
    if (a.endsWith("EMPTY") || b.endsWith("EMPTY"))
      throw new IllegalArgumentException("st_relate: EMPTY geometry is not supported")
    def pointy(t: String) = t == "POINT" || t == "MULTIPOINT"
    def polyish(t: String) = t == "POLYGON" || t == "MULTIPOLYGON"
    def liny(t: String) = t == "LINESTRING" || t == "MULTILINESTRING"
    // one polyline per part (each depth-1 group of a MULTILINESTRING)
    def lineParts(w: String): Seq[Array[(Double, Double)]] =
      if (geomType(w) == "LINESTRING") Seq(parseCoords(w)) else parseRings(w)
    // OGC mod-2 rule: a point is on a (multi)linestring's BOUNDARY
    // when it terminates an ODD number of parts; closed parts
    // contribute no boundary, an even-degree junction is interior
    // closedness is eps-tolerant like the rest of the tier (r10 ADVICE):
    // a part closed only to within computed-coordinate rounding must
    // not grow phantom boundary points
    def mod2Boundary(parts: Seq[Array[(Double, Double)]]): Seq[(Double, Double)] =
      parts.filter(p => !nearPt(p.head, p.last)).flatMap(p => Seq(p.head, p.last))
        .groupBy(snapKey).values.filter(_.size % 2 == 1).map(_.head).toSeq
    (geomType(a), geomType(b)) match {
      // POINT and MULTIPOINT are both finite point SETS (dim 0, empty
      // boundary) — one classification covers all four pairings (r9;
      // the single-point matrices are the one-element special case).
      case (ta, tb) if pointy(ta) && pointy(tb) =>
        val pa = parseCoords(a).distinct
        val pb = parseCoords(b).distinct
        val shared = pa.exists(p => pb.exists(q => nearPt(p, q)))
        val aOnly = pa.exists(p => !pb.exists(q => nearPt(p, q)))
        val bOnly = pb.exists(q => !pa.exists(p => nearPt(p, q)))
        new String(Array(
          if (shared) '0' else 'F', 'F', if (aOnly) '0' else 'F',
          'F', 'F', 'F',
          if (bOnly) '0' else 'F', 'F', '2'))
      case (ta, tb) if pointy(ta) && polyish(tb) =>
        // all rings (r9): a hole ring is polygon boundary too, and a
        // point INSIDE a hole is in the polygon's exterior (even-odd;
        // a MULTIPOLYGON's flat ring list classifies the same way)
        val pts = parseCoords(a).distinct
        val rings = parseRings(b).map(closedRing)
        val cs = pts.map { p =>
          if (rings.exists(r => onRingBoundary(r, p))) 'B'
          else if (rings.count(r => pointInRing(r, p._1, p._2)) % 2 == 1) 'I'
          else 'E'
        }
        new String(Array(
          if (cs.contains('I')) '0' else 'F',
          if (cs.contains('B')) '0' else 'F',
          if (cs.contains('E')) '0' else 'F',
          'F', 'F', 'F', '2', '1', '2'))
      case (ta, tb) if polyish(ta) && pointy(tb) =>
        transposeMatrix(relateMatrix(b, a))
      case (ta, tb) if pointy(ta) && liny(tb) =>
        // point set vs (multi)line (r9): classify each point against
        // the line set's interior / mod-2 boundary
        val pts = parseCoords(a).distinct
        val parts = lineParts(b)
        val ends = mod2Boundary(parts)
        val cs = pts.map { p =>
          if (ends.exists(e => nearPt(e, p))) 'B'
          else if (parts.exists(lb => (0 until lb.length - 1).exists(i =>
            ptOnSeg(p, lb(i), lb(i + 1))))) 'I'
          else 'E'
        }
        val eb = if (ends.exists(e => !pts.exists(p => nearPt(e, p)))) '0' else 'F'
        new String(Array(
          if (cs.contains('I')) '0' else 'F',
          if (cs.contains('B')) '0' else 'F',
          if (cs.contains('E')) '0' else 'F',
          'F', 'F', 'F', '1', eb, '2'))
      case (ta, tb) if liny(ta) && pointy(tb) =>
        transposeMatrix(relateMatrix(b, a))
      case (ta, tb) if liny(ta) && liny(tb) =>
        if (equalsGeom(a, b)) return "1FFF0FFF2"
        // r8 (multi-part since r9): computed for every regime incl.
        // collinear partial overlap and containment — mutually refine
        // the two polyline SETS, then derive each matrix cell from
        // shared sub-segments, junction contacts, and mod-2 endpoint
        // classifications.
        val partsA = lineParts(a)
        val partsB = lineParts(b)
        def edgesOf(ps: Seq[Array[(Double, Double)]]) = ps.toArray.flatMap(p =>
          Array.tabulate(p.length - 1)(i => (p(i), p(i + 1))))
        val segsA = partsA.toArray.flatMap(p => refinePolyline(p, edgesOf(partsB)))
        val segsB = partsB.toArray.flatMap(p => refinePolyline(p, edgesOf(partsA)))
        val keysB = segsB.map(segKey).toSet
        val sharedA = segsA.count(e => keysB.contains(segKey(e)))
        def onLine(ps: Seq[Array[(Double, Double)]], q: (Double, Double)) =
          ps.exists(p => (0 until p.length - 1).exists(i =>
            ptOnSeg(q, p(i), p(i + 1))))
        val ba = mod2Boundary(partsA)
        val bb = mod2Boundary(partsB)
        def isEndOf(ends: Seq[(Double, Double)], q: (Double, Double)) =
          ends.exists(e => nearPt(e, q))
        // interior-interior point contact: a refined junction of A that
        // lies on B, excluding both line sets' boundary points (a part
        // head at a flattened-part seam is either boundary — excluded —
        // or an even-degree junction, which IS interior)
        val iiPoint = (1 until segsA.length).map(segsA(_)._1).exists(j =>
          !isEndOf(ba, j) && onLine(partsB, j) && !isEndOf(bb, j))
        val ii = if (sharedA > 0) '1' else if (iiPoint) '0' else 'F'
        val ibC = if (bb.exists(e => onLine(partsA, e) && !isEndOf(ba, e))) '0' else 'F'
        val ieC = if (sharedA < segsA.length) '1' else 'F'
        val biC = if (ba.exists(e => onLine(partsB, e) && !isEndOf(bb, e))) '0' else 'F'
        val bbC = if (ba.exists(e => isEndOf(bb, e))) '0' else 'F'
        val beC = if (ba.exists(e => !onLine(partsB, e))) '0' else 'F'
        val keysA = segsA.map(segKey).toSet
        val eiC = if (segsB.exists(e => !keysA.contains(segKey(e)))) '1' else 'F'
        val ebC = if (bb.exists(e => !onLine(partsA, e))) '0' else 'F'
        new String(Array(ii, ibC, ieC, biC, bbC, beC, eiC, ebC, '2'))
      case (ta, tb) if liny(ta) && polyish(tb) =>
        // r8 (multi-part since r9): computed exactly for every regime
        // (line along the boundary, endpoint tangency, crossings,
        // holes) — refine each part at its boundary incidences, then
        // classify each sub-segment midpoint and each refined junction
        // against the polygon's interior/boundary/exterior.
        val partsA = lineParts(a)
        val rings = parseRings(b)
        val closed = rings.map(closedRing)
        val polyEdges = rings.toArray.flatMap { r =>
          val o = openRing(r)
          Array.tabulate(o.length)(i => (o(i), o((i + 1) % o.length)))
        }
        def onB(p: (Double, Double)) = closed.exists(r => onRingBoundary(r, p))
        def inP(p: (Double, Double)) =
          closed.count(r => pointInRing(r, p._1, p._2)) % 2 == 1
        var ii = false; var ibSeg = false; var ibPt = false; var ie = false
        // boundary coverage over DEDUPLICATED undirected sub-segment
        // keys (r9 ADVICE): a backtracking polyline retracing the same
        // boundary edge must not double-count its length and falsely
        // report the whole perimeter covered (EB 'F' instead of '1')
        val onSegLen =
          scala.collection.mutable.Map.empty[((Long, Long), (Long, Long)), Double]
        for (pa <- partsA) {
          val segs = refinePolyline(pa, polyEdges)
          for ((s, e) <- segs) {
            val mid = ((s._1 + e._1) / 2, (s._2 + e._2) / 2)
            if (onB(mid)) {
              ibSeg = true
              onSegLen(segKey((s, e))) = math.hypot(e._1 - s._1, e._2 - s._2)
            } else if (inP(mid)) ii = true
            else ie = true
          }
          // refined junctions are line-INTERIOR points; one on the
          // boundary is a dim-0 contact (a crossing or tangent touch)
          for (k <- 1 until segs.length)
            if (onB(segs(k)._1)) ibPt = true
        }
        // interior vertices not covered by the junction scan: even-
        // degree part seams and the start vertex of a closed part are
        // line-interior, so a tangent touch exactly there is IB dim-0
        val partEnds = partsA.filter(p => !nearPt(p.head, p.last))
          .flatMap(p => Seq(p.head, p.last))
        for (grp <- partEnds.groupBy(snapKey).values if grp.size % 2 == 0)
          if (onB(grp.head)) ibPt = true
        for (p <- partsA if nearPt(p.head, p.last))
          if (onB(p.head)) ibPt = true
        val onLen = onSegLen.values.sum
        // line-set boundary: mod-2 endpoints (a closed part has none)
        val epCls = mod2Boundary(partsA).map(p =>
          if (onB(p)) 'B' else if (inP(p)) 'I' else 'E')
        val perim = closed.map(r =>
          (0 until r.length - 1).map(i =>
            math.hypot(r(i + 1)._1 - r(i)._1, r(i + 1)._2 - r(i)._2)).sum).sum
        new String(Array(
          if (ii) '1' else 'F',
          if (ibSeg) '1' else if (ibPt) '0' else 'F',
          if (ie) '1' else 'F',
          if (epCls.contains('I')) '0' else 'F',
          if (epCls.contains('B')) '0' else 'F',
          if (epCls.contains('E')) '0' else 'F',
          '2',
          if (ibSeg && onLen >= perim - 1e-9) 'F' else '1',
          '2'))
      case (ta, tb) if polyish(ta) && liny(tb) =>
        transposeMatrix(relateMatrix(b, a))
      case (ta, tb) if polyish(ta) && polyish(tb) =>
        if (equalsGeom(a, b)) return "2FFF1FFF2"
        // r8: exact for ANY simple polygon pair (concave, holed,
        // boundary-tangent) — interior relations decided from the
        // subdivision overlay's exact intersection area, boundary
        // relations from the max pairwise ring contact dimension.
        // Closes the boundary-tangent containment regimes previously
        // declared out.
        exactIntArea(a, b) match {
          case Some(ia) =>
            // Interior cells (II/IE/EI) from the exact intersection
            // area; ALL four boundary-mixed cells (IB/BI/BE/EB) from a
            // midpoint classification of each boundary's refined
            // sub-segments against the other polygon — never hardcoded
            // per regime (r9 ADVICE: the old fixed matrices emitted
            // BE='1' when B's shell coincides with A's entire shell,
            // and coerced BB='0' for hole-driven overlaps whose
            // boundaries never touch).
            val aArea = area(a); val bArea = area(b)
            val tol = 1e-9 * math.max(1.0, math.max(aArea, bArea))
            val ringsA = parseRings(a).map(closedRing)
            val ringsB = parseRings(b).map(closedRing)
            def edgesOf(rs: Seq[Array[(Double, Double)]]) = rs.toArray.flatMap { r =>
              val o = openRing(r)
              Array.tabulate(o.length)(i => (o(i), o((i + 1) % o.length)))
            }
            val edgesA = edgesOf(ringsA); val edgesB = edgesOf(ringsB)
            def onBd(rs: Seq[Array[(Double, Double)]], p: (Double, Double)) =
              rs.exists(r => onRingBoundary(r, p))
            def inPoly(rs: Seq[Array[(Double, Double)]], p: (Double, Double)) =
              rs.count(r => pointInRing(r, p._1, p._2)) % 2 == 1
            /** (sharesBoundary, entersInterior, entersExterior) of X's
              * boundary against polygon Y. */
            def cls(ringsX: Seq[Array[(Double, Double)]],
                edgesY: Array[((Double, Double), (Double, Double))],
                ringsY: Seq[Array[(Double, Double)]]): (Boolean, Boolean, Boolean) = {
              var sh = false; var in = false; var out = false
              for (r <- ringsX; (s, e) <- refinePolyline(r, edgesY)) {
                val mid = ((s._1 + e._1) / 2, (s._2 + e._2) / 2)
                if (onBd(ringsY, mid)) sh = true
                else if (inPoly(ringsY, mid)) in = true
                else out = true
              }
              (sh, in, out)
            }
            val (shA, inA, outA) = cls(ringsA, edgesB, ringsB)
            val (shB, inB, outB) = cls(ringsB, edgesA, ringsA)
            val bbDim = ringsA.flatMap(ra =>
              ringsB.map(rb => boundaryContactDim(ra, rb))).max
            val bb =
              if (shA || shB || bbDim == 1) '1'
              else if (bbDim == 0) '0'
              else 'F'
            new String(Array(
              if (ia > tol) '2' else 'F',        // II
              if (inB) '1' else 'F',             // IB
              if (aArea - ia > tol) '2' else 'F',// IE
              if (inA) '1' else 'F',             // BI
              bb,                                // BB
              if (outA) '1' else 'F',            // BE
              if (bArea - ia > tol) '2' else 'F',// EI
              if (outB) '1' else 'F',            // EB
              '2'))                              // EE
          case None =>
            val ra = closedRing(parseRings(a).head)
            val rb = closedRing(parseRings(b).head)
            require(isConvexRing(ra) && isConvexRing(rb),
              "st_relate: non-simple polygons are not supported")
            val areaC = ringArea(clipConvex(ra, rb))
            if (areaC > 1e-12) {
              val aArea = ringArea(ra)
              val bArea = ringArea(rb)
              if (math.abs(areaC - bArea) <= 1e-9 * bArea) "212FF1FF2"
              else if (math.abs(areaC - aArea) <= 1e-9 * aArea) "2FF1FF212"
              else "212101212"
            } else boundaryContactDim(ra, rb) match {
              case 1 => "FF2F11212"
              case 0 => "FF2F01212"
              case _ => "FF2FF1212"
            }
        }
      case (ta, tb) =>
        throw new IllegalArgumentException(
          s"st_relate: unsupported geometry regime ($ta, $tb)")
    }
  }

  /** 3-arg ST_Relate: DE-9IM pattern match (T = any intersection,
    * F = none, * = either, 0/1/2 = exact dimension). */
  def relatePattern(a: String, b: String, pattern: String): Boolean = {
    require(pattern.length == 9,
      s"st_relate: pattern must be 9 characters, got '$pattern'")
    val m = relateMatrix(a, b)
    (0 until 9).forall { i =>
      pattern.charAt(i) match {
        case '*' => true
        case 'T' | 't' => m.charAt(i) != 'F'
        case 'F' | 'f' => m.charAt(i) == 'F'
        case c => Character.toUpperCase(c) == m.charAt(i)
      }
    }
  }

  /** ST_SymDifference: (A \ B) ∪ (B \ A) — exact via Greiner–Hormann
    * for simple single-ring pairs in general position (r4 late),
    * envelope-scope rectangle decomposition otherwise. */
  def symDifference(a: String, b: String): String =
    if (a.endsWith("EMPTY")) b
    else if (b.endsWith("EMPTY")) a
    else symDifferenceExact(a, b).getOrElse(
      partsWkt(rectMinus(envelope(a), envelope(b)) ++
        rectMinus(envelope(b), envelope(a))))

  /** Exact interior-intersection area for POLYGON/POLYGON pairs the
    * overlay engine can answer (single-ring or holed, any contact
    * regime since r8); None → caller keeps its envelope fallback. */
  private def exactIntArea(a: String, b: String): Option[Double] = {
    def polyish(t: String) = t == "POLYGON" || t == "MULTIPOLYGON"
    if (polyish(geomType(a)) && polyish(geomType(b)))
      overlayExact(a, b, "intersection").map(area)
    else None
  }

  /** ST_Overlaps. Exact for polygon pairs since r8 (OGC area/area
    * semantics: interiors intersect, neither contains the other —
    * decided from the exact intersection area); envelope-scope
    * otherwise. */
  def overlaps(a: String, b: String): Boolean = {
    if (a.endsWith("EMPTY") || b.endsWith("EMPTY")) return false
    // OGC: equal dims only; "T*T***T**" (dim 0/2) / "1*T***T**" (lines)
    tryRelate(a, b) match {
      case Some(m) =>
        val da = dimOf(geomType(a)); val db = dimOf(geomType(b))
        return da == db &&
          (if (da == 1) m(0) == '1' else m(0) != 'F') &&
          m(2) != 'F' && m(6) != 'F'
      case None =>
    }
    exactIntArea(a, b) match {
      case Some(ia) =>
        val tol = 1e-12 * math.max(1.0, math.max(area(a), area(b)))
        ia > tol && area(a) - ia > tol && area(b) - ia > tol
      case None =>
        val (ax0, ay0, ax1, ay1) = envelope(a)
        val (bx0, by0, bx1, by1) = envelope(b)
        val proper = math.max(ax0, bx0) < math.min(ax1, bx1) &&
          math.max(ay0, by0) < math.min(ay1, by1)
        val aInB = ax0 >= bx0 && ax1 <= bx1 && ay0 >= by0 && ay1 <= by1
        val bInA = bx0 >= ax0 && bx1 <= ax1 && by0 >= ay0 && by1 <= ay1
        proper && !aInB && !bInA
    }
  }

  /** ST_Touches. Exact for polygon pairs since r8 (boundaries meet —
    * point or segment contact — while the exact interior intersection
    * is empty); envelope-scope otherwise. */
  def touches(a: String, b: String): Boolean = {
    if (a.endsWith("EMPTY") || b.endsWith("EMPTY")) return false
    // OGC: interiors disjoint, boundaries meet — "FT*******" |
    // "F**T*****" | "F***T****"
    tryRelate(a, b) match {
      case Some(m) =>
        return m(0) == 'F' && (m(1) != 'F' || m(3) != 'F' || m(4) != 'F')
      case None =>
    }
    exactIntArea(a, b) match {
      case Some(ia) =>
        val tol = 1e-12 * math.max(1.0, math.max(area(a), area(b)))
        ia <= tol && {
          val ringsA = parseRings(a).map(closedRing)
          val ringsB = parseRings(b).map(closedRing)
          ringsA.exists(ra => ringsB.exists(rb => boundaryContactDim(ra, rb) >= 0))
        }
      case None =>
        val (ax0, ay0, ax1, ay1) = envelope(a)
        val (bx0, by0, bx1, by1) = envelope(b)
        val ix0 = math.max(ax0, bx0); val ix1 = math.min(ax1, bx1)
        val iy0 = math.max(ay0, by0); val iy1 = math.min(ay1, by1)
        ix0 <= ix1 && iy0 <= iy1 && (ix0 == ix1 || iy0 == iy1)
    }
  }

  /** OGC well-known-binary encoding, little-endian, for POINT /
    * LINESTRING / POLYGON (single ring) / MULTIPOINT — ST_AsBinary.
    * Format per the public OGC Simple Features spec. */
  def asBinary(wkt: String): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val t = geomType(wkt)
    val pts = if (wkt.endsWith("EMPTY")) Array.empty[(Double, Double)]
      else parseCoords(wkt)
    def buf(n: Int) = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    t match {
      case "POINT" =>
        buf(21).put(1.toByte).putInt(1)
          .putDouble(pts(0)._1).putDouble(pts(0)._2).array()
      case "LINESTRING" =>
        val b = buf(9 + 16 * pts.length).put(1.toByte).putInt(2).putInt(pts.length)
        pts.foreach(p => b.putDouble(p._1).putDouble(p._2))
        b.array()
      case "POLYGON" =>
        // every ring (outer + interior holes) is serialized
        val rings = parseRings(wkt)
        val b = buf(9 + 4 * rings.length + 16 * rings.map(_.length).sum)
          .put(1.toByte).putInt(3).putInt(rings.length)
        rings.foreach { ring =>
          b.putInt(ring.length)
          ring.foreach(p => b.putDouble(p._1).putDouble(p._2))
        }
        b.array()
      case "MULTIPOINT" =>
        val b = buf(9 + 21 * pts.length).put(1.toByte).putInt(4).putInt(pts.length)
        pts.foreach(p => b.put(1.toByte).putInt(1).putDouble(p._1).putDouble(p._2))
        b.array()
      case _ =>
        throw new IllegalArgumentException(s"st_as_binary: unsupported $t")
    }
  }

  /** Inverse of [[asBinary]] — ST_GeomFromBinary. */
  def fromBinary(wkb: Array[Byte]): String = {
    import java.nio.{ByteBuffer, ByteOrder}
    val b = ByteBuffer.wrap(wkb)
    b.order(if (b.get() == 1.toByte) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    def pt(): String = s"${fmt(b.getDouble)} ${fmt(b.getDouble)}"
    b.getInt match {
      case 1 => s"POINT (${pt()})"
      case 2 =>
        val n = b.getInt
        s"LINESTRING (${(1 to n).map(_ => pt()).mkString(", ")})"
      case 3 =>
        val nRings = b.getInt
        val rings = (1 to nRings).map { _ =>
          val n = b.getInt
          s"(${(1 to n).map(_ => pt()).mkString(", ")})"
        }
        s"POLYGON (${rings.mkString(", ")})"
      case 4 =>
        val n = b.getInt
        s"MULTIPOINT (${(1 to n).map { _ => b.get(); b.getInt; pt() }.mkString(", ")})"
      case other =>
        throw new IllegalArgumentException(s"st_geom_from_binary: unsupported type $other")
    }
  }

  /** Depth-2 paren groups of a MULTIPOLYGON body — one string per
    * part, each holding that part's shell (+ hole) rings. */
  private def multiParts(wkt: String): Seq[String] = {
    val body = wkt.substring(wkt.indexOf('('))
    val out = Seq.newBuilder[String]
    var depth = 0; var start = -1
    var i = 0
    while (i < body.length) {
      body.charAt(i) match {
        case '(' => depth += 1; if (depth == 2) start = i
        case ')' =>
          if (depth == 2 && start >= 0) {
            out += body.substring(start, i + 1); start = -1
          }
          depth -= 1
        case _ =>
      }
      i += 1
    }
    out.result()
  }

  /** Shoelace area over every ring of a POLYGON / MULTIPOLYGON — the
    * multi-part-aware sibling of the single-ring st_area macro. Rings
    * after the first WITHIN a part are interior holes and SUBTRACT
    * (OGC semantics) — for MULTIPOLYGON the part structure is parsed
    * so hole-carrying parts (which the r4 exact overlay can emit)
    * count correctly. */
  def area(wkt: String): Double = {
    if (wkt.endsWith("EMPTY")) return 0.0
    def ringAreas(s: String): Seq[Double] = parseRings(s).map { ring =>
      math.abs((0 until ring.length - 1).map(i =>
        ring(i)._1 * ring(i + 1)._2 - ring(i + 1)._1 * ring(i)._2).sum) / 2.0
    }
    geomType(wkt) match {
      case "POLYGON" =>
        val rings = ringAreas(wkt)
        if (rings.length > 1) rings.head - rings.tail.sum else rings.sum
      case "MULTIPOLYGON" =>
        multiParts(wkt).map { part =>
          val rings = ringAreas(part)
          if (rings.length > 1) rings.head - rings.tail.sum else rings.sum
        }.sum
      case _ => ringAreas(wkt).sum
    }
  }

  /** WKT type token → the reference's JTS-style camel-case name, used
    * in line_locate_point's error text (GeoFunctions.java:505,510). */
  private def jtsName(t: String): String = t match {
    case "POINT" => "Point"
    case "MULTIPOINT" => "MultiPoint"
    case "LINESTRING" => "LineString"
    case "MULTILINESTRING" => "MultiLineString"
    case "POLYGON" => "Polygon"
    case "MULTIPOLYGON" => "MultiPolygon"
    case other => other
  }

  /** line_locate_point(line, point) — fraction in [0,1] of the line's
    * total 2D length at the point on the line nearest the argument
    * (GeoFunctions.java:492-514: JTS LengthIndexedLine.indexOf /
    * getLength). MULTILINESTRING parts index continuously in order,
    * as in JTS; ties keep the FIRST (lowest-index) nearest point;
    * EMPTY input → null; wrong argument types throw the reference's
    * message. */
  def lineLocatePoint(lineWkt: String, pointWkt: String): java.lang.Double = {
    val lt = geomType(lineWkt)
    val pt = geomType(pointWkt)
    if (lt != "LINESTRING" && lt != "MULTILINESTRING")
      throw new IllegalArgumentException(
        s"First argument to line_locate_point must be a LineString or a MultiLineString. Got: ${jtsName(lt)}")
    if (pt != "POINT")
      throw new IllegalArgumentException(
        s"Second argument to line_locate_point must be a Point. Got: ${jtsName(pt)}")
    if (lineWkt.endsWith("EMPTY") || pointWkt.endsWith("EMPTY")) return null
    val Array((px, py)) = parseCoords(pointWkt)
    var cum = 0.0
    var best = Double.MaxValue
    var bestIdx = 0.0
    parseRings(lineWkt).foreach { part =>
      var i = 0
      while (i < part.length - 1) {
        val (x1, y1) = part(i)
        val (x2, y2) = part(i + 1)
        val (dx, dy) = (x2 - x1, y2 - y1)
        val len = math.hypot(dx, dy)
        val t =
          if (len == 0) 0.0
          else math.max(0.0, math.min(1.0, ((px - x1) * dx + (py - y1) * dy) / (len * len)))
        val d = math.hypot(px - (x1 + t * dx), py - (y1 + t * dy))
        if (d < best) { best = d; bestIdx = cum + t * len }
        cum += len
        i += 1
      }
    }
    java.lang.Double.valueOf(bestIdx / cum) // zero-length line → NaN, like the reference's 0/0
  }

  /** geometry_union over an array of geometries (GeoFunctions.java:627).
    * SQL nulls are ignored (the reference skips empty slices); null
    * when no non-null input. Single non-empty input passes through
    * unchanged; n ≥ 2 inputs produce the envelope-scope union as a
    * DISJOINT rectangle decomposition built incrementally (each new
    * envelope contributes only its parts outside every part so far) —
    * the summed area is the true union-of-envelopes area. A naive
    * fold of the pairwise [[union]] would instead re-envelope the
    * accumulated MULTIPOLYGON each step and over-count. */
  def unionArray(arr: org.apache.spark.sql.catalyst.util.ArrayData): String = {
    val wkts = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) wkts += arr.getUTF8String(i).toString
      i += 1
    }
    if (wkts.isEmpty) return null
    val nonEmpty = wkts.filterNot(_.endsWith("EMPTY"))
    if (nonEmpty.isEmpty) return "POLYGON EMPTY"
    if (nonEmpty.length == 1) return nonEmpty.head
    var parts = Seq(envelope(nonEmpty.head))
    nonEmpty.tail.foreach { g =>
      var pieces: Seq[Rect] = Seq(envelope(g))
      parts.foreach(p => pieces = pieces.flatMap(rectMinus(_, p)))
      parts = parts ++ pieces
    }
    partsWkt(parts)
  }

  /** geometry_invalid_reason (GeoFunctions.java:443-478): the reason a
    * geometry fails [[isSimple]], with the reference's reason strings
    * (NON_SIMPLE_REASONS, GeoFunctions.java:121-129) and "at or near"
    * vertex coordinates; null when valid. Regimes covered = the same
    * point/multipoint/linestring/polygon checks isSimple performs
    * (degenerate segment, repeated vertex, proper self-crossing). */
  def invalidReason(wkt: String): String = {
    if (wkt.endsWith("EMPTY")) return null
    def at(p: (Double, Double)): String = s"(${p._1} ${p._2})"
    val t = geomType(wkt)
    if (t == "POINT") return null
    val raw = parseCoords(wkt)
    if (t == "MULTIPOINT") {
      val seen = scala.collection.mutable.HashSet.empty[(Double, Double)]
      raw.foreach { p =>
        if (!seen.add(p)) return s"Repeated points at or near ${at(p)}"
      }
      return null
    }
    val ring = t == "POLYGON" || (raw.length > 1 && raw.head == raw.last)
    val pts = if (ring) raw.dropRight(1) else raw
    var i = 0
    while (i < pts.length - 1) {
      if (pts(i) == pts(i + 1))
        return s"Degenerate segments at or near ${at(pts(i))}"
      i += 1
    }
    val seen = scala.collection.mutable.HashSet.empty[(Double, Double)]
    pts.foreach { p =>
      if (!seen.add(p)) return s"Repeated points at or near ${at(p)}"
    }
    val segs = (if (ring) pts.toSeq :+ pts.head else pts.toSeq)
      .sliding(2).filter(_.length == 2).map(s => (s(0), s(1))).toArray
    i = 0
    while (i < segs.length) {
      var j = i + 2
      val jMax = if (ring && i == 0) segs.length - 1 else segs.length
      while (j < jMax) {
        if (properCross(segs(i)._1, segs(i)._2, segs(j)._1, segs(j)._2))
          return s"Self-intersection at or near ${at(segs(i)._1)} and ${at(segs(j)._1)}"
        j += 1
      }
      i += 1
    }
    null
  }

  // --- General-position exact overlay: Greiner–Hormann (r4 late) ------
  // Public algorithm (Greiner & Hormann, "Efficient Clipping of
  // Arbitrary Polygons", ACM TOG 17(2), 1998): exact intersection /
  // union / difference / sym-difference for SIMPLE single-ring
  // polygons — concave included — whose boundaries meet only in proper
  // edge crossings. Degenerate contact (shared vertices, vertex-on-
  // edge, collinear overlap, grazing) is detected and REFUSED so
  // callers keep their documented envelope fallback rather than risk a
  // silent wrong dissolve. Reference scope: presto-geospatial
  // GeoFunctions.java:560,627,698 (Esri OperatorIntersection/Union/
  // Difference handle the same regime).

  private final class GhNode(val x: Double, val y: Double,
      val isect: Boolean, val alpha: Double) {
    var next: GhNode = _
    var prev: GhNode = _
    var neighbor: GhNode = _
    var entry: Boolean = false
    var visited: Boolean = false
  }

  private sealed trait GhOut
  private case object GhDegenerate extends GhOut
  private case object GhNoCross extends GhOut
  private final case class GhRings(rings: Vector[Array[(Double, Double)]])
    extends GhOut

  private val GhEps = 1e-11

  private def signedArea(open: Array[(Double, Double)]): Double =
    open.indices.map { i =>
      val u = open(i); val v = open((i + 1) % open.length)
      u._1 * v._2 - v._1 * u._2
    }.sum / 2.0

  private def nearPt(p: (Double, Double), q: (Double, Double)): Boolean =
    math.abs(p._1 - q._1) < 1e-9 && math.abs(p._2 - q._2) < 1e-9

  /** Open ring, CCW, rotated to start at the lexicographic minimum —
    * one canonical text for a given point cycle. */
  private def canonRing(r: Array[(Double, Double)]): Array[(Double, Double)] = {
    val open = openRing(r)
    val ccw = if (signedArea(open) >= 0) open else open.reverse
    val k = ccw.indices.minBy(ccw(_))
    ccw.drop(k) ++ ccw.take(k)
  }

  private def polyWithHole(shell: Array[(Double, Double)],
      hole: Array[(Double, Double)]): String =
    s"POLYGON (${ringWkt(closedRing(canonRing(shell)).toSeq)}, " +
      s"${ringWkt(closedRing(canonRing(hole).reverse).toSeq)})"

  /** Greiner–Hormann phases 1–3 over open rings (normalized CCW here).
    * Flip semantics with both rings CCW: (false,false) = A∩B,
    * (true,true) = A∪B, (true,false) = A−B. */
  private def ghClip(aIn: Array[(Double, Double)], bIn: Array[(Double, Double)],
      flipA: Boolean, flipB: Boolean): GhOut = {
    val aOpen = if (signedArea(aIn) >= 0) aIn else aIn.reverse
    val bOpen = if (signedArea(bIn) >= 0) bIn else bIn.reverse
    val na = aOpen.length; val nb = bOpen.length
    val insA = Array.fill(na)(List.empty[GhNode])
    val insB = Array.fill(nb)(List.empty[GhNode])
    var crossings = 0
    var i = 0
    while (i < na) {
      val p1 = aOpen(i); val p2 = aOpen((i + 1) % na)
      var j = 0
      while (j < nb) {
        val q1 = bOpen(j); val q2 = bOpen((j + 1) % nb)
        val rx = p2._1 - p1._1; val ry = p2._2 - p1._2
        val sx = q2._1 - q1._1; val sy = q2._2 - q1._2
        val den = rx * sy - ry * sx
        val lenScale = math.sqrt((rx * rx + ry * ry) * (sx * sx + sy * sy))
        if (math.abs(den) <= GhEps * math.max(lenScale, 1.0)) {
          // parallel; a collinear interval overlap is degenerate contact
          val c = (q1._1 - p1._1) * ry - (q1._2 - p1._2) * rx
          if (math.abs(c) <= GhEps * math.max(lenScale, 1.0)) {
            val horiz = math.abs(rx) >= math.abs(ry)
            def ax(p: (Double, Double)) = if (horiz) p._1 else p._2
            val lo = math.max(math.min(ax(p1), ax(p2)), math.min(ax(q1), ax(q2)))
            val hi = math.min(math.max(ax(p1), ax(p2)), math.max(ax(q1), ax(q2)))
            if (hi >= lo - GhEps) return GhDegenerate
          }
        } else {
          val t = ((q1._1 - p1._1) * sy - (q1._2 - p1._2) * sx) / den
          val u = ((q1._1 - p1._1) * ry - (q1._2 - p1._2) * rx) / den
          if (t > -GhEps && t < 1.0 + GhEps && u > -GhEps && u < 1.0 + GhEps) {
            if (t < GhEps || t > 1.0 - GhEps || u < GhEps || u > 1.0 - GhEps)
              return GhDegenerate // endpoint contact: vertex-on-edge/vertex
            val x = p1._1 + t * rx; val y = p1._2 + t * ry
            val nA = new GhNode(x, y, true, t)
            val nB = new GhNode(x, y, true, u)
            nA.neighbor = nB; nB.neighbor = nA
            insA(i) ::= nA; insB(j) ::= nB
            crossings += 1
          }
        }
        j += 1
      }
      i += 1
    }
    if (crossings == 0) return GhNoCross
    // two closed curves in general position cross an even number of
    // times — an odd count means numerically grazing contact
    if (crossings % 2 != 0) return GhDegenerate

    def build(open: Array[(Double, Double)], ins: Array[List[GhNode]]): GhNode = {
      var head: GhNode = null; var tail: GhNode = null
      def append(n: GhNode): Unit = {
        if (head == null) { head = n; tail = n }
        else { tail.next = n; n.prev = tail; tail = n }
      }
      for (k <- open.indices) {
        append(new GhNode(open(k)._1, open(k)._2, false, 0.0))
        ins(k).sortBy(_.alpha).foreach(append)
      }
      tail.next = head; head.prev = tail
      head
    }
    val headA = build(aOpen, insA)
    val headB = build(bOpen, insB)

    // phase 2: alternate entry/exit from the first vertex's insideness
    def mark(head: GhNode, other: Array[(Double, Double)], flip: Boolean): Unit = {
      var entry = !pointInRing(closedRing(other), head.x, head.y)
      if (flip) entry = !entry
      var n = head
      do {
        if (n.isect) { n.entry = entry; entry = !entry }
        n = n.next
      } while (n ne head)
    }
    mark(headA, bOpen, flipA)
    mark(headB, aOpen, flipB)

    // phase 3: trace result rings, switching lists at each crossing
    val out = Vector.newBuilder[Array[(Double, Double)]]
    val cap = 4 * (na + nb + 2 * crossings)
    val aNodes = {
      val buf = Vector.newBuilder[GhNode]
      var n = headA
      do { buf += n; n = n.next } while (n ne headA)
      buf.result()
    }
    for (s <- aNodes if s.isect && !s.visited) {
      val buf = scala.collection.mutable.ArrayBuffer[(Double, Double)]((s.x, s.y))
      var cur: GhNode = s
      var steps = 0
      var ok = true
      var done = false
      while (ok && !done) {
        cur.visited = true; cur.neighbor.visited = true
        if (cur.entry) {
          do { cur = cur.next; buf += ((cur.x, cur.y)); steps += 1 }
          while (!cur.isect && steps < cap)
        } else {
          do { cur = cur.prev; buf += ((cur.x, cur.y)); steps += 1 }
          while (!cur.isect && steps < cap)
        }
        if (steps >= cap) ok = false
        else {
          cur = cur.neighbor
          done = (cur eq s) || (cur.neighbor eq s)
        }
      }
      if (!ok) return GhDegenerate
      val cleaned = buf.foldLeft(Vector.empty[(Double, Double)]) { (acc, p) =>
        if (acc.nonEmpty && nearPt(acc.last, p)) acc else acc :+ p
      }
      val ring0 =
        if (cleaned.length > 1 && nearPt(cleaned.head, cleaned.last))
          cleaned.dropRight(1)
        else cleaned
      if (ring0.length >= 3) out += ring0.toArray
    }
    GhRings(out.result())
  }

  // --- Degenerate-contact exact overlay (r4 #5, closed r8) ------------
  // When boundaries meet in shared vertices, vertex-on-edge contact, or
  // collinear overlap, Greiner–Hormann's entry/exit alternation breaks
  // down and [[ghClip]] refuses. This path computes the overlay on the
  // REFINED planar subdivision instead (the classical map-overlay idea,
  // de Berg et al. "Computational Geometry" ch. 2; the same regime
  // Foster/Hormann/Popa 2019 extend GH to): insert every
  // boundary-boundary incidence point into both rings — after which any
  // A-edge and B-edge are disjoint, endpoint-sharing, or identical —
  // then select directed edges per op by midpoint / shared-direction
  // classification and stitch result rings with leftmost-turn traversal
  // (pinch vertices resolve into separate simple rings). Exact for
  // simple single-ring polygons in ANY contact regime; the reference
  // gets this from ESRI (presto-geospatial GeoFunctions.java:560,627,
  // 698 via OperatorIntersection/Union/Difference).

  private val GhSnap = 1e-9

  private def snapKey(p: (Double, Double)): (Long, Long) =
    (math.round(p._1 / GhSnap), math.round(p._2 / GhSnap))

  /** Undirected snapped identity of a sub-segment — the dedup key for
    * refined edges (a backtracking polyline yields the same key for
    * both directions of a retraced edge). */
  private def segKey(e: ((Double, Double), (Double, Double)))
      : ((Long, Long), (Long, Long)) = {
    val (ks, ke) = (snapKey(e._1), snapKey(e._2))
    if (Ordering[(Long, Long)].lteq(ks, ke)) (ks, ke) else (ke, ks)
  }

  /** Split one directed segment at its incidence points with the given
    * edge set (proper crossings, endpoint contacts, collinear-overlap
    * endpoints), appending sub-segments to `out`. */
  private def splitSegInto(p1: (Double, Double), p2: (Double, Double),
      otherEdges: Array[((Double, Double), (Double, Double))],
      out: scala.collection.mutable.Builder[
        ((Double, Double), (Double, Double)),
        Array[((Double, Double), (Double, Double))]]): Unit = {
    val rx = p2._1 - p1._1; val ry = p2._2 - p1._2
    val rLen2 = rx * rx + ry * ry
    var ts = List.empty[Double]
    var j = 0
    while (j < otherEdges.length) {
      val (q1, q2) = otherEdges(j)
      val sx = q2._1 - q1._1; val sy = q2._2 - q1._2
      val den = rx * sy - ry * sx
      val lenScale = math.sqrt(rLen2 * (sx * sx + sy * sy))
      if (math.abs(den) <= GhEps * math.max(lenScale, 1.0)) {
        val c = (q1._1 - p1._1) * ry - (q1._2 - p1._2) * rx
        if (math.abs(c) <= GhEps * math.max(lenScale, 1.0)) {
          // collinear: project q1/q2 onto [p1,p2]; interior hits split
          for (q <- Seq(q1, q2)) {
            val t = ((q._1 - p1._1) * rx + (q._2 - p1._2) * ry) / rLen2
            if (t > GhEps && t < 1.0 - GhEps) ts ::= t
          }
        }
      } else {
        val t = ((q1._1 - p1._1) * sy - (q1._2 - p1._2) * sx) / den
        val u = ((q1._1 - p1._1) * ry - (q1._2 - p1._2) * rx) / den
        if (t > GhEps && t < 1.0 - GhEps && u > -GhEps && u < 1.0 + GhEps)
          ts ::= t
      }
      j += 1
    }
    val cuts = ts.sorted.foldLeft(List.empty[Double]) { (acc, t) =>
      if (acc.nonEmpty && t - acc.head < GhEps) acc else t :: acc
    }.reverse
    var prev = p1
    for (t <- cuts) {
      val q = (p1._1 + t * rx, p1._2 + t * ry)
      if (snapKey(q) != snapKey(prev)) { out += ((prev, q)); prev = q }
    }
    if (snapKey(prev) != snapKey(p2)) out += ((prev, p2))
  }

  /** Split every edge of `ring` at its incidence points with the other
    * polygon's edges. `otherEdges` is the other polygon's full directed
    * edge list (all rings). Returns the refined directed edge list. */
  private def refineRing(ring: Array[(Double, Double)],
      otherEdges: Array[((Double, Double), (Double, Double))])
      : Array[((Double, Double), (Double, Double))] = {
    val out = Array.newBuilder[((Double, Double), (Double, Double))]
    for (i <- ring.indices)
      splitSegInto(ring(i), ring((i + 1) % ring.length), otherEdges, out)
    out.result()
  }

  /** Same refinement for an OPEN polyline (no closing edge). */
  private def refinePolyline(pts: Array[(Double, Double)],
      otherEdges: Array[((Double, Double), (Double, Double))])
      : Array[((Double, Double), (Double, Double))] = {
    val out = Array.newBuilder[((Double, Double), (Double, Double))]
    for (i <- 0 until pts.length - 1)
      splitSegInto(pts(i), pts(i + 1), otherEdges, out)
    out.result()
  }

  /** Single-ring convenience wrapper over [[subdivisionOverlay]]. */
  private[graft] def degenerateOverlay(aIn: Array[(Double, Double)],
      bIn: Array[(Double, Double)], op: String): Option[String] =
    subdivisionOverlay(Seq(aIn), Seq(bIn), op)

  /** Exact overlay on the refined planar subdivision, for polygons WITH
    * interior rings (r4 missing #4, closed r8) and any contact regime
    * (proper crossings included — refinement inserts those too). Inputs
    * are OPEN rings, shell first, holes after; returns the assembled
    * WKT, or None if stitching fails (the caller then keeps its
    * documented envelope fallback). Orientation is normalized so the
    * polygon interior lies LEFT of every directed edge (shell CCW,
    * holes CW); the shared-edge same-direction rule and the midpoint
    * even-odd classification then hold unchanged with holes. */
  private[functions] def subdivisionOverlay(aRingsIn: Seq[Array[(Double, Double)]],
      bRingsIn: Seq[Array[(Double, Double)]], op: String): Option[String] = {
    // Ring role by containment-depth parity, not list position (r9):
    // a ring nested inside an EVEN number of the geometry's other
    // rings is an outer boundary (CCW), odd depth is a hole (CW).
    // Position-based "first = shell, rest = holes" broke MULTIPOLYGON
    // inputs, whose later shells are NOT holes; depth parity
    // reproduces shell/hole for single polygons and generalizes to
    // disjoint parts and nested islands.
    def orient(rings: Seq[Array[(Double, Double)]]): Seq[Array[(Double, Double)]] = {
      val closed = rings.map(closedRing)
      rings.zipWithIndex.map { case (r, i) =>
        val others = closed.zipWithIndex.collect { case (r2, j) if j != i => r2 }
        // Depth parity must be probed OFF other rings' boundaries (r10
        // ADVICE): pointInRing is unspecified exactly on an edge, so a
        // hole tangent to its shell at the probe vertex could be
        // mis-oriented. Try the ring's vertices, then edge midpoints —
        // rings of a valid input don't cross, so any incidence-free
        // point of r carries the ring's true depth.
        val v = (r.iterator ++ r.indices.iterator.map { k =>
          val s = r(k); val e = r((k + 1) % r.length)
          ((s._1 + e._1) / 2, (s._2 + e._2) / 2)
        }).find(p => !others.exists(o => onRingBoundary(o, p)))
          .getOrElse(r(0))
        val depth = others.count(o => pointInRing(o, v._1, v._2))
        val ccw = signedArea(r) >= 0
        if (depth % 2 == 0) { if (ccw) r else r.reverse } // outer CCW
        else { if (ccw) r.reverse else r }                // hole CW
      }
    }
    val aRings = orient(aRingsIn)
    val bRings = orient(bRingsIn)

    def ringEdges(r: Array[(Double, Double)]) =
      Array.tabulate(r.length)(i => (r(i), r((i + 1) % r.length)))
    val aRawEdges = aRings.toArray.flatMap(ringEdges)
    val bRawEdges = bRings.toArray.flatMap(ringEdges)

    // canonical point registry: A's and B's float versions of the same
    // incidence point must unify exactly for edge matching / stitching
    val reps = scala.collection.mutable.Map.empty[(Long, Long), (Double, Double)]
    def canon(p: (Double, Double)): (Double, Double) =
      reps.getOrElseUpdate(snapKey(p), p)

    // refine BOTH subdivisions against the union of all edges (r10):
    // refining each side only against the other polygon missed splits
    // where a ring is incident on its OWN geometry's other rings — e.g.
    // a hole tangent to the shell at a vertex: the other polygon's
    // coincident shell edge got split there but this one's didn't, so
    // the shared-edge keys disagreed and stitching failed. Self-edges
    // are harmless: splitSegInto only inserts strictly interior cuts.
    val allRawEdges = aRawEdges ++ bRawEdges
    val aEdges = aRings.toArray.flatMap(r => refineRing(r, allRawEdges))
      .map { case (s, e) => (canon(s), canon(e)) }
    val bEdges = bRings.toArray.flatMap(r => refineRing(r, allRawEdges))
      .map { case (s, e) => (canon(s), canon(e)) }

    // undirected edge key → direction, for shared-edge detection
    def undirected(e: ((Double, Double), (Double, Double))) = {
      val (ks, ke) = (snapKey(e._1), snapKey(e._2))
      if (Ordering[(Long, Long)].lteq(ks, ke)) ((ks, ke), true)
      else ((ke, ks), false)
    }
    val bDirByKey = bEdges.map { e =>
      val (k, fwd) = undirected(e); k -> fwd
    }.toMap
    val aKeys = aEdges.map(e => undirected(e)._1).toSet

    // even-odd point-in-polygon across ALL rings (shell + holes)
    val aClosed = aRings.map(closedRing)
    val bClosed = bRings.map(closedRing)
    def inPoly(rings: Seq[Array[(Double, Double)]], x: Double, y: Double): Boolean =
      rings.count(r => pointInRing(r, x, y)) % 2 == 1

    val selected = Vector.newBuilder[((Double, Double), (Double, Double))]

    for (e <- aEdges) {
      val (k, fwd) = undirected(e)
      bDirByKey.get(k) match {
        case Some(bFwd) =>
          val sameDir = fwd == bFwd
          // shared edge: interiors locally on the same side iff both
          // boundaries (interior-left oriented) traverse it in the
          // same direction — holds for hole edges too
          val keep = op match {
            case "intersection" | "union" => sameDir
            case "difference" => !sameDir
          }
          if (keep) selected += e
        case None =>
          val mid = ((e._1._1 + e._2._1) / 2, (e._1._2 + e._2._2) / 2)
          val in = inPoly(bClosed, mid._1, mid._2)
          val keep = op match {
            case "intersection" => in
            case "union" | "difference" => !in
          }
          if (keep) selected += e
      }
    }
    for (e <- bEdges if !aKeys.contains(undirected(e)._1)) {
      val mid = ((e._1._1 + e._2._1) / 2, (e._1._2 + e._2._2) / 2)
      val in = inPoly(aClosed, mid._1, mid._2)
      op match {
        case "intersection" => if (in) selected += e
        case "union" => if (!in) selected += e
        case "difference" => if (in) selected += e.swap // reversed: hole side
      }
    }

    val edges = selected.result()
    if (edges.isEmpty) return Some("POLYGON EMPTY")

    // stitch: leftmost-turn traversal keeps the result interior on the
    // left and splits pinch vertices into separate simple rings
    val used = Array.fill(edges.length)(false)
    val byStart = edges.indices.groupBy(i => snapKey(edges(i)._1))
    val rings = Vector.newBuilder[Array[(Double, Double)]]
    var steps = 0
    val cap = 4 * edges.length + 8
    for (s <- edges.indices if !used(s)) {
      val buf = scala.collection.mutable.ArrayBuffer[(Double, Double)](edges(s)._1)
      var cur = s
      var closed = false
      var stuck = false
      while (!closed && !stuck && steps < cap) {
        used(cur) = true
        steps += 1
        val end = edges(cur)._2
        buf += end
        if (snapKey(end) == snapKey(edges(s)._1)) closed = true
        else {
          val dIn = (end._1 - edges(cur)._1._1, end._2 - edges(cur)._1._2)
          val cands = byStart.getOrElse(snapKey(end), Seq.empty).filterNot(used)
          if (cands.isEmpty) stuck = true
          else cur = cands.maxBy { c =>
            val d = (edges(c)._2._1 - edges(c)._1._1, edges(c)._2._2 - edges(c)._1._2)
            val ang = math.atan2(dIn._1 * d._2 - dIn._2 * d._1,
              dIn._1 * d._1 + dIn._2 * d._2)
            // a U-turn (ang == π) must rank WORST, not best
            if (ang > math.Pi - 1e-9) -math.Pi else ang
          }
        }
      }
      if (stuck || (!closed && steps >= cap)) return None
      val ring = buf.dropRight(1).toArray
      // drop lower-dimensional slivers (contact lines traced both ways)
      if (ring.length >= 3 && math.abs(signedArea(ring)) > 1e-12)
        rings += ring
    }
    val rs = rings.result()
    Some(if (rs.isEmpty) "POLYGON EMPTY" else assembleRingsWkt(rs))
  }

  /** Shell/hole nesting of disjoint traversal rings → canonical WKT. */
  private def assembleRingsWkt(ringsIn: Vector[Array[(Double, Double)]]): String = {
    if (ringsIn.isEmpty) return "POLYGON EMPTY"
    val rings = ringsIn.map(canonRing)
    def containsIdx(i: Int, j: Int): Boolean = {
      val p = rings(j).head
      pointInRing(closedRing(rings(i)), p._1, p._2)
    }
    val depth = rings.indices.map(j =>
      rings.indices.count(i => i != j && containsIdx(i, j)))
    val shellIdx = rings.indices.filter(i => depth(i) % 2 == 0)
    val byShell = scala.collection.mutable.Map.empty[Int, Vector[Int]]
    val orphan = scala.collection.mutable.ArrayBuffer.empty[Int]
    rings.indices.filter(i => depth(i) % 2 == 1).foreach { h =>
      val cands = shellIdx.filter(s => containsIdx(s, h))
      if (cands.isEmpty) orphan += h // inconsistent nesting: promote
      else {
        val s = cands.maxBy(depth(_))
        byShell(s) = byShell.getOrElse(s, Vector.empty) :+ h
      }
    }
    val pieces = (shellIdx ++ orphan).sorted.map { s =>
      val holes = byShell.getOrElse(s, Vector.empty).map(h => rings(h).reverse)
      (rings(s) +: holes).map(r => ringWkt(closedRing(r).toSeq))
        .mkString("(", ", ", ")")
    }
    if (pieces.length == 1) s"POLYGON ${pieces.head}"
    else pieces.mkString("MULTIPOLYGON (", ", ", ")")
  }

  /** Both inputs are plain axis-aligned rectangles — the regime whose
    * canonical form is the disjoint rectangle decomposition shared
    * with geometry_union / geometry_union_agg. */
  private def isAxisRect(wkt: String): Boolean = {
    if (geomType(wkt) != "POLYGON" || wkt.endsWith("EMPTY")) return false
    val rings = parseRings(wkt)
    rings.length == 1 && {
      val open = openRing(rings.head)
      open.length == 4 && {
        val (x0, y0, x1, y1) = envelope(wkt)
        open.toSet == Set((x0, y0), (x1, y0), (x1, y1), (x0, y1))
      }
    }
  }

  /** Exact overlay for simple single-ring POLYGON pairs in general
    * position. None → caller's documented fallback applies. */
  private[functions] def overlayExact(a: String, b: String, op: String): Option[String] = {
    // MULTIPOLYGON accepted since r9: the subdivision overlay's
    // containment-depth ring orientation + even-odd classification
    // treat a flat ring list with several outer shells correctly, so
    // multipart inputs ride the same path as holed polygons.
    def polyish(t: String) = t == "POLYGON" || t == "MULTIPOLYGON"
    if (!polyish(geomType(a)) || !polyish(geomType(b)) ||
      a.endsWith("EMPTY") || b.endsWith("EMPTY")) return None
    val ringsA = parseRings(a); val ringsB = parseRings(b)
    if (ringsA.exists(openRing(_).length < 3) ||
      ringsB.exists(openRing(_).length < 3)) return None
    // simplicity per RING (isSimple flattens all rings into one chain
    // and would false-flag the shell/hole closure vertices)
    def simpleRing(r: Array[(Double, Double)]): Boolean = {
      val open = openRing(r)
      val n = open.length
      if (open.distinct.length != n) return false
      val segs = Array.tabulate(n)(i => (open(i), open((i + 1) % n)))
      segs.indices.forall { i =>
        val jMax = if (i == 0) n - 1 else n
        (i + 2 until jMax).forall(j =>
          !properCross(segs(i)._1, segs(i)._2, segs(j)._1, segs(j)._2))
      }
    }
    if (!(ringsA ++ ringsB).forall(simpleRing)) return None
    // interior rings (holes) on either side: the refined-subdivision
    // overlay handles holes AND every contact regime directly (r8)
    if (ringsA.length != 1 || ringsB.length != 1)
      return subdivisionOverlay(ringsA.map(openRing), ringsB.map(openRing), op)
    val aO = openRing(ringsA.head); val bO = openRing(ringsB.head)
    val clipped = op match {
      case "intersection" => ghClip(aO, bO, flipA = false, flipB = false)
      case "union"        => ghClip(aO, bO, flipA = true, flipB = true)
      case "difference"   => ghClip(aO, bO, flipA = true, flipB = false)
    }
    clipped match {
      case GhDegenerate => degenerateOverlay(aO, bO, op)
      case GhRings(rs)  => Some(assembleRingsWkt(rs))
      case GhNoCross =>
        val aInB = pointInRing(closedRing(bO), aO.head._1, aO.head._2)
        val bInA = pointInRing(closedRing(aO), bO.head._1, bO.head._2)
        Some(op match {
          case "intersection" =>
            if (aInB) a else if (bInA) b else "POLYGON EMPTY"
          case "union" =>
            if (aInB) b else if (bInA) a
            else s"MULTIPOLYGON ((${ringWkt(closedRing(canonRing(aO)).toSeq)}), " +
              s"(${ringWkt(closedRing(canonRing(bO)).toSeq)}))"
          case "difference" =>
            if (aInB) "POLYGON EMPTY"
            else if (bInA) polyWithHole(aO, bO)
            else a
        })
    }
  }

  /** Exact ST_SymDifference for the same regime: (A−B) ⊎ (B−A) pooled
    * into one shell/hole assembly. */
  private[functions] def symDifferenceExact(a: String, b: String): Option[String] = {
    if (!Seq(a, b).forall(w => geomType(w) == "POLYGON" || geomType(w) == "MULTIPOLYGON") ||
      a.endsWith("EMPTY") || b.endsWith("EMPTY")) return None
    val ringsA = parseRings(a); val ringsB = parseRings(b)
    if (ringsA.length != 1 || ringsB.length != 1) {
      // holes: sym-diff = (A−B) ⊎ (B−A), each via the refined overlay
      def partsOf(w: String): Seq[String] =
        if (w.endsWith("EMPTY")) Seq.empty
        else if (geomType(w) == "POLYGON") Seq(w.substring(w.indexOf('(')))
        else multiParts(w)
      return (overlayExact(a, b, "difference"), overlayExact(b, a, "difference")) match {
        case (Some(w1), Some(w2)) =>
          val all = partsOf(w1) ++ partsOf(w2)
          Some(
            if (all.isEmpty) "POLYGON EMPTY"
            else if (all.length == 1) s"POLYGON ${all.head}"
            else all.mkString("MULTIPOLYGON (", ", ", ")"))
        case _ => None
      }
    }
    if (!isSimple(a) || !isSimple(b)) return None
    val aO = openRing(ringsA.head); val bO = openRing(ringsB.head)
    if (aO.length < 3 || bO.length < 3) return None
    (ghClip(aO, bO, flipA = true, flipB = false),
      ghClip(bO, aO, flipA = true, flipB = false)) match {
      case (GhRings(r1), GhRings(r2)) =>
        // assemble each side separately: the two sides' rings touch
        // along shared boundary arcs, so a pooled even-odd nesting
        // pass could misread one side's piece as the other's hole
        def parts(rs: Vector[Array[(Double, Double)]]): Seq[String] = {
          val w = assembleRingsWkt(rs)
          if (w.endsWith("EMPTY")) Seq.empty
          else if (geomType(w) == "POLYGON") Seq(w.substring(w.indexOf('(')))
          else multiParts(w)
        }
        val all = parts(r1) ++ parts(r2)
        Some(
          if (all.isEmpty) "POLYGON EMPTY"
          else if (all.length == 1) s"POLYGON ${all.head}"
          else all.mkString("MULTIPOLYGON (", ", ", ")"))
      case (GhNoCross, _) =>
        val aInB = pointInRing(closedRing(bO), aO.head._1, aO.head._2)
        val bInA = pointInRing(closedRing(aO), bO.head._1, bO.head._2)
        Some(
          if (aInB) polyWithHole(bO, aO)
          else if (bInA) polyWithHole(aO, bO)
          else s"MULTIPOLYGON ((${ringWkt(closedRing(canonRing(aO)).toSeq)}), " +
            s"(${ringWkt(closedRing(canonRing(bO)).toSeq)}))")
      case _ =>
        // degenerate contact on either direction: refined-subdivision
        // overlay of both one-sided differences, combined part-wise
        def partsOf(w: String): Seq[String] =
          if (w.endsWith("EMPTY")) Seq.empty
          else if (geomType(w) == "POLYGON") Seq(w.substring(w.indexOf('(')))
          else multiParts(w)
        (degenerateOverlay(aO, bO, "difference"),
          degenerateOverlay(bO, aO, "difference")) match {
          case (Some(w1), Some(w2)) =>
            val all = partsOf(w1) ++ partsOf(w2)
            Some(
              if (all.isEmpty) "POLYGON EMPTY"
              else if (all.length == 1) s"POLYGON ${all.head}"
              else all.mkString("MULTIPOLYGON (", ", ", ")"))
          case _ => None
        }
    }
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

/** Ray-cast point-in-polygon as a codegen'd expression — replaces the
  * interpreted st_contains macro (identical arithmetic; see
  * [[GeoAlgorithms.containsPoint]]). */
case class StContains(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "st_contains"
  override def nullSafeEval(poly: Any, pt: Any): Any =
    GeoAlgorithms.containsGeom(poly.asInstanceOf[UTF8String].toString,
      pt.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (poly, pt) =>
      s"graft.functions.GeoAlgorithms.containsGeom($poly.toString(), $pt.toString())")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StContains =
    copy(left = l, right = r)
}

/** Dispatch targets for the grouped topology expressions below. */
object GeoDispatch {
  def pred1(fn: String, g: String): Boolean = fn match {
    case "st_is_simple" | "st_is_valid" => GeoAlgorithms.isSimple(g)
  }
  def pred2(fn: String, a: String, b: String): Boolean = fn match {
    case "st_equals"   => GeoAlgorithms.equalsGeom(a, b)
    case "st_touches"  => GeoAlgorithms.touches(a, b)
    case "st_overlaps" => GeoAlgorithms.overlaps(a, b)
    case "st_crosses"  => GeoAlgorithms.crosses(a, b)
  }
  def comb2(fn: String, a: String, b: String): String = fn match {
    case "st_difference"     => GeoAlgorithms.difference(a, b)
    case "st_sym_difference" => GeoAlgorithms.symDifference(a, b)
  }
}

/** Unary geometry predicate (st_is_simple / st_is_valid). */
case class GeoPredicate1(child: Expression, fn: String) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = fn
  override def nullSafeEval(g: Any): Any =
    GeoDispatch.pred1(fn, g.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g =>
      s"""graft.functions.GeoDispatch.pred1("$fn", $g.toString())""")
  override protected def withNewChildInternal(c: Expression): GeoPredicate1 =
    copy(child = c)
}

/** Binary geometry predicate (st_equals / st_touches / st_overlaps —
  * the latter two envelope-scope, see [[GeoAlgorithms]]). */
case class GeoPredicate2(left: Expression, right: Expression, fn: String)
  extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = fn
  override def nullSafeEval(a: Any, b: Any): Any =
    GeoDispatch.pred2(fn, a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"""graft.functions.GeoDispatch.pred2("$fn", $a.toString(), $b.toString())""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GeoPredicate2 =
    copy(left = l, right = r)
}

/** Binary geometry overlay (st_difference / st_sym_difference,
  * envelope-scope rectangle decomposition). */
case class GeoCombine2(left: Expression, right: Expression, fn: String)
  extends BinaryExpression with WktStaticCall {
  override def prettyName: String = fn
  override def nullSafeEval(a: Any, b: Any): Any =
    UTF8String.fromString(GeoDispatch.comb2(fn,
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"""org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.GeoDispatch.comb2("$fn", $a.toString(), $b.toString()))""".stripMargin)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GeoCombine2 =
    copy(left = l, right = r)
}

/** Ramer–Douglas–Peucker simplification — ST_Simplify. */
case class StSimplify(left: Expression, right: Expression)
  extends BinaryExpression with WktStaticCall {
  override def prettyName: String = "st_simplify"
  override def nullSafeEval(g: Any, t: Any): Any =
    UTF8String.fromString(GeoAlgorithms.simplify(
      g.asInstanceOf[UTF8String].toString, t.asInstanceOf[Double]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, t) =>
      s"""org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.GeoAlgorithms.simplify($g.toString(), $t))""".stripMargin)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StSimplify =
    copy(left = l, right = r)
}

/** OGC WKB serialization — ST_AsBinary / ST_GeomFromBinary. */
case class StAsBinary(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_as_binary"
  override def nullSafeEval(g: Any): Any =
    GeoAlgorithms.asBinary(g.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g =>
      s"graft.functions.GeoAlgorithms.asBinary($g.toString())")
  override protected def withNewChildInternal(c: Expression): StAsBinary =
    copy(child = c)
}

case class StGeomFromBinary(child: Expression) extends UnaryExpression with WktStaticCall {
  override def prettyName: String = "st_geom_from_binary"
  override def nullSafeEval(b: Any): Any =
    UTF8String.fromString(GeoAlgorithms.fromBinary(b.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b =>
      s"""org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.GeoAlgorithms.fromBinary($b))""".stripMargin)
  override protected def withNewChildInternal(c: Expression): StGeomFromBinary =
    copy(child = c)
}

/** line_locate_point(line, point) — GeoFunctions.java:492. Nullable:
  * EMPTY inputs locate to null, so codegen routes through the boxed
  * helper result instead of defineCodeGen's non-null contract. */
case class LineLocatePoint(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "line_locate_point"
  override def nullSafeEval(a: Any, b: Any): Any =
    GeoAlgorithms.lineLocatePoint(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Double ${ev.value}_r =
         |  graft.functions.GeoAlgorithms.lineLocatePoint($a.toString(), $b.toString());
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }""".stripMargin)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): LineLocatePoint =
    copy(left = l, right = r)
}

/** geometry_union(array<geometry>) — GeoFunctions.java:627; null for an
  * empty / all-null array, like the reference's empty cursor. */
case class GeometryUnionN(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "geometry_union"
  override def nullSafeEval(a: Any): Any = {
    val r = GeoAlgorithms.unionArray(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    if (r == null) null else UTF8String.fromString(r)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""String ${ev.value}_r = graft.functions.GeoAlgorithms.unionArray($a);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  org.apache.spark.unsafe.types.UTF8String.fromString(${ev.value}_r); }""".stripMargin)
  override protected def withNewChildInternal(c: Expression): GeometryUnionN =
    copy(child = c)
}

/** geometry_invalid_reason — GeoFunctions.java:443; null when valid. */
case class GeometryInvalidReason(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "geometry_invalid_reason"
  override def nullSafeEval(g: Any): Any = {
    val r = GeoAlgorithms.invalidReason(g.asInstanceOf[UTF8String].toString)
    if (r == null) null else UTF8String.fromString(r)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, g =>
      s"""String ${ev.value}_r = graft.functions.GeoAlgorithms.invalidReason($g.toString());
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  org.apache.spark.unsafe.types.UTF8String.fromString(${ev.value}_r); }""".stripMargin)
  override protected def withNewChildInternal(c: Expression): GeometryInvalidReason =
    copy(child = c)
}

/** 2-arg ST_Relate — the DE-9IM matrix string (PostGIS-style text
  * form; the reference only ships the 3-arg boolean, but the matrix is
  * what makes the relation value-checkable). */
case class StRelateMatrix(left: Expression, right: Expression)
  extends BinaryExpression with WktStaticCall {
  override def prettyName: String = "st_relate"
  override def nullSafeEval(a: Any, b: Any): Any =
    UTF8String.fromString(GeoAlgorithms.relateMatrix(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"""org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.GeoAlgorithms.relateMatrix($a.toString(), $b.toString()))""".stripMargin)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StRelateMatrix =
    copy(left = l, right = r)
}

/** 3-arg ST_Relate(geom, geom, pattern) — GeoFunctions.java:1078. */
case class StRelatePattern(first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "st_relate"
  override def nullSafeEval(a: Any, b: Any, p: Any): Any =
    GeoAlgorithms.relatePattern(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString, p.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, p) =>
      s"graft.functions.GeoAlgorithms.relatePattern($a.toString(), $b.toString(), $p.toString())")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression): StRelatePattern = copy(first = a, second = b, third = c)
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
