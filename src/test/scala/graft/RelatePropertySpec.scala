package graft

import graft.functions.GeoAlgorithms
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Property-level consistency for the DE-9IM relate tier (r9): on
  * pseudo-random geometry pairs the matrix must (a) transpose under
  * argument swap, (b) agree with the standalone overlaps/touches
  * predicates, and (c) use only legal cell values with EE = 2. These
  * are algebraic identities of DE-9IM itself, so they hold for EVERY
  * pair the engine claims to support — a much wider net than the
  * hand-picked fixtures.
  */
class RelatePropertySpec extends AnyFunSuite with Matchers {
  private def transpose(m: String): String =
    new String(Array(m(0), m(3), m(6), m(1), m(4), m(7), m(2), m(5), m(8)))

  /** Deterministic pseudo-random convex polygon: k points on a circle
    * with seeded angular jitter, CCW. */
  private def convexPoly(seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    val k = 4 + rnd.nextInt(4)
    val cx = rnd.nextInt(20) - 10.0
    val cy = rnd.nextInt(20) - 10.0
    val r = 1.0 + rnd.nextInt(6)
    val pts = (0 until k).map { i =>
      val ang = 2 * math.Pi * (i + 0.4 * rnd.nextDouble()) / k
      // 2-decimal grid keeps WKT short; shapes remain convex-ish and
      // in general position
      (math.rint((cx + r * math.cos(ang)) * 100) / 100,
        math.rint((cy + r * math.sin(ang)) * 100) / 100)
    }
    val ring = (pts :+ pts.head).map(p => s"${p._1} ${p._2}").mkString(", ")
    s"POLYGON (($ring))"
  }

  private def randLine(seed: Int): String = {
    val rnd = new scala.util.Random(seed * 31 + 7)
    val n = 2 + rnd.nextInt(3)
    val pts = (0 until n).map { _ =>
      (math.rint((rnd.nextDouble() * 24 - 12) * 100) / 100,
        math.rint((rnd.nextDouble() * 24 - 12) * 100) / 100)
    }
    s"LINESTRING (${pts.map(p => s"${p._1} ${p._2}").mkString(", ")})"
  }

  private def randPoint(seed: Int): String = {
    val rnd = new scala.util.Random(seed * 17 + 3)
    s"POINT (${math.rint((rnd.nextDouble() * 24 - 12) * 100) / 100} " +
      s"${math.rint((rnd.nextDouble() * 24 - 12) * 100) / 100})"
  }

  private val legal = Set('0', '1', '2', 'F')

  private def checkPair(a: String, b: String): Unit = {
    val m = GeoAlgorithms.relateMatrix(a, b)
    withClue(s"$a vs $b -> $m: ") {
      m.length shouldBe 9
      m.forall(legal.contains) shouldBe true
      m(8) shouldBe '2' // exteriors always meet in the plane
      GeoAlgorithms.relateMatrix(b, a) shouldBe transpose(m)
    }
  }

  test("polygon/polygon: transpose identity + predicate agreement") {
    for (i <- 1 to 40; j <- i + 1 to math.min(i + 4, 41)) {
      val a = convexPoly(i); val b = convexPoly(j)
      val m = GeoAlgorithms.relateMatrix(a, b)
      checkPair(a, b)
      withClue(s"$a vs $b -> $m: ") {
        // ST_Overlaps == "T*T***T**" for area/area (OGC)
        GeoAlgorithms.overlaps(a, b) shouldBe
          (m(0) != 'F' && m(2) != 'F' && m(6) != 'F')
        // ST_Touches == interiors disjoint && some boundary contact
        GeoAlgorithms.touches(a, b) shouldBe
          (m(0) == 'F' && (m(1) != 'F' || m(3) != 'F' || m(4) != 'F'))
      }
    }
  }

  test("point and line pairs: transpose identity + legal cells") {
    for (i <- 1 to 30) {
      checkPair(randPoint(i), convexPoly(i + 100))
      checkPair(randPoint(i), randLine(i + 200))
      checkPair(randLine(i), convexPoly(i + 300))
      checkPair(randPoint(i), randPoint(i + 400))
    }
    // incidence-heavy pairs: vertices shared with the polygon
    for (i <- 1 to 10) {
      val p = convexPoly(i)
      val coords = GeoAlgorithms.parseCoords(p)
      val v = coords(0)
      checkPair(s"POINT (${v._1} ${v._2})", p)
      val w = coords(1)
      checkPair(s"LINESTRING (${v._1} ${v._2}, ${w._1} ${w._2})", p)
    }
  }

  test("multi-geometry pairs: transpose identity + legal cells") {
    def multiPoly(i: Int): String = {
      // two disjoint convex parts (x-offset separates them)
      def shift(w: String, dx: Double) =
        "(" + GeoAlgorithms.parseCoords(w)
          .map(p => s"${p._1 + dx} ${p._2}").mkString(", ") + ")"
      s"MULTIPOLYGON ((${shift(convexPoly(i), 0)}), (${shift(convexPoly(i + 50), 40)}))"
    }
    def multiLine(i: Int): String =
      s"MULTILINESTRING ((${GeoAlgorithms.parseCoords(randLine(i)).map(p => s"${p._1} ${p._2}").mkString(", ")}), " +
        s"(${GeoAlgorithms.parseCoords(randLine(i + 60)).map(p => s"${p._1} ${p._2}").mkString(", ")}))"
    def multiPoint(i: Int): String =
      s"MULTIPOINT (${(0 to 2).map(k => randPoint(i * 3 + k).stripPrefix("POINT (").stripSuffix(")")).mkString(", ")})"
    for (i <- 1 to 12) {
      checkPair(multiPoly(i), convexPoly(i + 500))
      checkPair(multiLine(i), convexPoly(i + 600))
      checkPair(multiLine(i), randLine(i + 700))
      checkPair(multiPoint(i), multiPoly(i + 7))
      checkPair(multiPoint(i), multiLine(i + 13))
    }
  }
}
