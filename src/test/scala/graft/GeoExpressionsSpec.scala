package graft

import graft.functions.{BetaDist, GeoAlgorithms}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class GeoExpressionsSpec extends AnyFunSuite with Matchers {

  test("convex hull drops interior and collinear points, closes the ring") {
    val hull = GeoAlgorithms.convexHull(
      "MULTIPOINT (0 0, 2 0, 4 0, 4 3, 0 3, 1 1, 2 2)")
    GeoAlgorithms.area(hull) shouldBe 12.0
    // ring of 4 corners + closing vertex; (2 0) is collinear and dropped
    hull.count(_ == ',') shouldBe 4
  }

  test("convex hull passes degenerate inputs through") {
    GeoAlgorithms.convexHull("POINT (1 2)") shouldBe "POINT (1 2)"
    GeoAlgorithms.convexHull("MULTIPOINT (0 0, 1 1, 2 2)") shouldBe
      "MULTIPOINT (0 0, 1 1, 2 2)"
  }

  test("rect union decomposition never double-counts overlap") {
    // B sticks out on three sides of A
    val u = GeoAlgorithms.union(
      "POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0))",
      "POLYGON ((2 -1, 6 -1, 6 5, 2 5, 2 -1))")
    GeoAlgorithms.area(u) shouldBe (12.0 + 24.0 - 6.0)
    // containment collapses to the outer rectangle
    val c = GeoAlgorithms.union(
      "POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0))",
      "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))")
    c should startWith("POLYGON")
    GeoAlgorithms.area(c) shouldBe 12.0
  }

  test("WKB round-trips a polygon with interior rings") {
    val donut =
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"
    val rt = GeoAlgorithms.fromBinary(GeoAlgorithms.asBinary(donut))
    rt shouldBe donut
    GeoAlgorithms.area(rt) shouldBe 96.0
  }

  test("polygon interior rings subtract from geom_area (OGC holes)") {
    GeoAlgorithms.area(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))") shouldBe
      (100.0 - 4.0)
    // multipolygon parts still sum
    GeoAlgorithms.area(
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))") shouldBe
      (1.0 + 4.0)
  }

  test("st_crosses distinguishes crossing, touching, and containment") {
    GeoAlgorithms.crosses(
      "LINESTRING (0 0, 4 4)", "LINESTRING (0 4, 4 0)") shouldBe true
    GeoAlgorithms.crosses(
      "LINESTRING (0 0, 2 2)", "LINESTRING (2 2, 4 0)") shouldBe false
    GeoAlgorithms.crosses(
      "LINESTRING (-1 1, 5 1)", "POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0))") shouldBe true
    GeoAlgorithms.crosses(
      "POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0))", "LINESTRING (1 1, 2 2)") shouldBe false
    // parallel lines never cross
    GeoAlgorithms.crosses(
      "LINESTRING (0 0, 4 0)", "LINESTRING (0 1, 4 1)") shouldBe false
    // a long segment whose endpoints AND midpoint are outside still
    // crosses the polygon it passes through (edge-crossing test)
    GeoAlgorithms.crosses(
      "LINESTRING (-10 1, 30 1)", "POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0))") shouldBe true
    // crossing exactly at an interior vertex of one line
    GeoAlgorithms.crosses(
      "LINESTRING (0 2, 4 2)", "LINESTRING (0 0, 2 2, 4 0)") shouldBe true
    // collinear overlap is a 1-dim meet — not a crossing
    GeoAlgorithms.crosses(
      "LINESTRING (0 0, 4 0)", "LINESTRING (1 0, 3 0)") shouldBe false
    GeoAlgorithms.crosses(
      "LINESTRING (0 0, 2 0, 2 2)", "LINESTRING (1 0, 3 0)") shouldBe false
  }

  test("convex intersection is exact (Sutherland-Hodgman), not envelope") {
    // triangle x+y<=6 clips the square's far corner: 16 - 8 = 8
    val i1 = GeoAlgorithms.intersection(
      "POLYGON ((0 0, 6 0, 0 6, 0 0))",
      "POLYGON ((1 1, 5 1, 5 5, 1 5, 1 1))")
    GeoAlgorithms.area(i1) shouldBe 8.0
    // envelope math would report min(4,3)x… = 2x3 = 6 here; the exact
    // clip of the rect by the triangle is 6 - 2 = 4
    val i2 = GeoAlgorithms.intersection(
      "POLYGON ((0 0, 4 0, 0 4, 0 0))",
      "POLYGON ((1 -1, 3 -1, 3 3, 1 3, 1 -1))")
    GeoAlgorithms.area(i2) shouldBe 4.0
    // rectangles still produce the full overlap rectangle
    val i3 = GeoAlgorithms.intersection(
      "POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0))",
      "POLYGON ((2 1, 6 1, 6 5, 2 5, 2 1))")
    GeoAlgorithms.area(i3) shouldBe 4.0
    // disjoint convex pairs are empty
    GeoAlgorithms.intersection(
      "POLYGON ((0 0, 1 0, 0 1, 0 0))",
      "POLYGON ((5 5, 6 5, 5 6, 5 5))") shouldBe "POLYGON EMPTY"
  }

  test("empty intersection reports POLYGON EMPTY with zero area") {
    val i = GeoAlgorithms.intersection(
      "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
      "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))")
    i shouldBe "POLYGON EMPTY"
    GeoAlgorithms.area(i) shouldBe 0.0
  }

  test("beta cdf matches closed forms and is symmetric") {
    for (x <- Seq(0.05, 0.25, 0.5, 0.75, 0.95)) {
      BetaDist.cdf(1, 1, x) shouldBe (x +- 1e-12)
      BetaDist.cdf(2, 2, x) shouldBe (x * x * (3 - 2 * x) +- 1e-12)
      // I_x(a,b) = 1 - I_{1-x}(b,a)
      BetaDist.cdf(3.5, 1.25, x) shouldBe
        (1.0 - BetaDist.cdf(1.25, 3.5, 1 - x) +- 1e-12)
      BetaDist.inverseCdf(3.5, 1.25, BetaDist.cdf(3.5, 1.25, x)) shouldBe
        (x +- 1e-9)
    }
  }
}
