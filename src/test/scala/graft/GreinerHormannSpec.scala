package graft

import graft.functions.GeoAlgorithms
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Exact concave overlay (Greiner–Hormann, r4 late): every expected
  * value below is hand-derived from the fixture decompositions noted
  * inline — no call under test feeds another's expectation. */
class GreinerHormannSpec extends AnyFunSuite with Matchers {

  // L-shape: [0,4]x[0,2] ∪ [0,2]x[2,4], area 12, concave at (2,2)
  private val L = "POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))"
  // clip box [1,5]^2, area 16
  private val box = "POLYGON ((1 1, 5 1, 5 5, 1 5, 1 1))"

  test("concave ∩ rect: L ∩ box = [1,4]x[1,2] + [1,2]x[2,4] = 5") {
    val w = GeoAlgorithms.intersection(L, box)
    w should startWith("POLYGON")
    GeoAlgorithms.area(w) shouldBe 5.0 +- 1e-9
  }

  test("concave ∪ rect: area(L) + area(box) − area(∩) = 12 + 16 − 5") {
    val w = GeoAlgorithms.union(L, box)
    GeoAlgorithms.area(w) shouldBe 23.0 +- 1e-9
  }

  test("concave differences: L − box = 7, box − L = 11") {
    GeoAlgorithms.area(GeoAlgorithms.difference(L, box)) shouldBe 7.0 +- 1e-9
    GeoAlgorithms.area(GeoAlgorithms.difference(box, L)) shouldBe 11.0 +- 1e-9
    GeoAlgorithms.area(GeoAlgorithms.symDifference(L, box)) shouldBe 18.0 +- 1e-9
  }

  // U-shape [0,5]x[0,4] minus slot [1,4]x[1,4] (slot opens upward):
  // area 20 − 9 = 11; bar y∈[2,3] across both arms
  private val U = "POLYGON ((0 0, 5 0, 5 4, 4 4, 4 1, 1 1, 1 4, 0 4, 0 0))"
  private val bar = "POLYGON ((-1 2, 6 2, 6 3, -1 3, -1 2))"

  test("two-piece intersection: U ∩ bar = both arm slices as MULTIPOLYGON") {
    val w = GeoAlgorithms.intersection(U, bar)
    w should startWith("MULTIPOLYGON")
    // [0,1]x[2,3] + [4,5]x[2,3]
    GeoAlgorithms.area(w) shouldBe 2.0 +- 1e-9
  }

  test("U ∪ bar dissolves into one ring spanning both") {
    val w = GeoAlgorithms.union(U, bar)
    // 11 + 7 − 2
    GeoAlgorithms.area(w) shouldBe 16.0 +- 1e-9
  }

  // square minus a piercing triangle: ∩ = 11 by ∫ (6 at x∈[4,5],
  // 16−2x at x∈[5,6]) — see fixture derivation in the gate row
  private val sq6 = "POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0))"
  private val tri = "POLYGON ((4 -1, 8 3, 4 7, 4 -1))"

  test("square − piercing triangle: 36 − 11 = 25; triangle − square = 5") {
    GeoAlgorithms.area(GeoAlgorithms.intersection(sq6, tri)) shouldBe 11.0 +- 1e-9
    GeoAlgorithms.area(GeoAlgorithms.difference(sq6, tri)) shouldBe 25.0 +- 1e-9
    GeoAlgorithms.area(GeoAlgorithms.difference(tri, sq6)) shouldBe 5.0 +- 1e-9
    GeoAlgorithms.area(GeoAlgorithms.symDifference(sq6, tri)) shouldBe 30.0 +- 1e-9
  }

  // ∩-shape: [0,10]^2 minus slot [3,7]x[0,8] (opens downward), area 68;
  // bar [2,8]x[1,3] (area 12) bridges the slot → encloses [3,7]x(3,8)
  // as a HOLE (20) and leaves the [3,7]x[0,1] notch open: union = 76
  private val arch = "POLYGON ((0 0, 3 0, 3 8, 7 8, 7 0, 10 0, 10 10, 0 10, 0 0))"
  private val plug = "POLYGON ((2 1, 8 1, 8 3, 2 3, 2 1))"

  test("hole-forming union: arch ∪ plug = outer ring + interior ring, 76") {
    val w = GeoAlgorithms.union(arch, plug)
    w should startWith("POLYGON") // one piece, two rings
    w.count(_ == '(') shouldBe 3  // outer paren + shell + hole
    GeoAlgorithms.area(w) shouldBe 76.0 +- 1e-9
  }

  test("no-crossing regimes stay exact: containment and disjoint") {
    val inner = "POLYGON ((0.5 0.5, 1.5 0.5, 1.5 1.5, 0.5 1.5, 0.5 0.5))"
    // concave container, so these route through the GH branch
    GeoAlgorithms.area(GeoAlgorithms.intersection(L, inner)) shouldBe 1.0 +- 1e-9
    GeoAlgorithms.area(GeoAlgorithms.difference(L, inner)) shouldBe 11.0 +- 1e-9
    val far = "POLYGON ((40 40, 41 40, 41 41, 40 41, 40 40))"
    GeoAlgorithms.intersection(L, far) shouldBe "POLYGON EMPTY"
    GeoAlgorithms.difference(L, far) shouldBe L
    GeoAlgorithms.union(L, far) should startWith("MULTIPOLYGON")
    GeoAlgorithms.area(GeoAlgorithms.union(L, far)) shouldBe 13.0 +- 1e-9
  }

  test("degenerate contact refuses the exact path but still answers") {
    // shared edge x=4: vertex-on-edge contact → envelope fallback
    val touching = "POLYGON ((4 0, 8 0, 8 2, 4 2, 4 0))"
    val w = GeoAlgorithms.intersection(L, touching)
    // envelope fallback of L's bbox [0,4]x[0,4] ∩ [4,8]x[0,2] = empty strip
    w shouldBe "POLYGON EMPTY"
  }

  test("traversal is input-order invariant: ops commute where they should") {
    GeoAlgorithms.area(GeoAlgorithms.intersection(box, L)) shouldBe 5.0 +- 1e-9
    GeoAlgorithms.area(GeoAlgorithms.union(box, L)) shouldBe 23.0 +- 1e-9
    GeoAlgorithms.area(GeoAlgorithms.symDifference(box, L)) shouldBe 18.0 +- 1e-9
  }

  test("inclusion–exclusion holds on randomized concave/rect pairs") {
    val rng = new scala.util.Random(20260813)
    for (_ <- 1 to 200) {
      // random L-shape at random offset (kept off-grid from the clip
      // rect via 0.137 shifts so contacts stay in general position)
      val ox = rng.nextInt(6) + 0.137; val oy = rng.nextInt(6) + 0.261
      val w = rng.nextInt(4) + 2.0; val h = rng.nextInt(4) + 2.0
      val a = s"POLYGON (($ox $oy, ${ox + w} $oy, ${ox + w} ${oy + h / 2}, " +
        s"${ox + w / 2} ${oy + h / 2}, ${ox + w / 2} ${oy + h}, $ox ${oy + h}, $ox $oy))"
      val bx = rng.nextInt(8).toDouble; val by = rng.nextInt(8).toDouble
      val bw = rng.nextInt(5) + 1.0; val bh = rng.nextInt(5) + 1.0
      val b = s"POLYGON (($bx $by, ${bx + bw} $by, ${bx + bw} ${by + bh}, " +
        s"$bx ${by + bh}, $bx $by))"
      val areaA = GeoAlgorithms.area(a)
      val areaB = GeoAlgorithms.area(b)
      val inter = GeoAlgorithms.area(GeoAlgorithms.intersection(a, b))
      GeoAlgorithms.area(GeoAlgorithms.union(a, b)) shouldBe
        (areaA + areaB - inter +- 1e-6)
      GeoAlgorithms.area(GeoAlgorithms.difference(a, b)) shouldBe
        (areaA - inter +- 1e-6)
      GeoAlgorithms.area(GeoAlgorithms.symDifference(a, b)) shouldBe
        (areaA + areaB - 2 * inter +- 1e-6)
    }
  }
}
