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

  test("edge-touching polygons intersect to EMPTY (exact, r8 degenerate path)") {
    // shared edge x=4: vertex-on-edge contact, handled exactly by the
    // refined-subdivision overlay since r8 (no envelope fallback)
    val touching = "POLYGON ((4 0, 8 0, 8 2, 4 2, 4 0))"
    val w = GeoAlgorithms.intersection(L, touching)
    w shouldBe "POLYGON EMPTY"
    GeoAlgorithms.area(GeoAlgorithms.union(L, touching)) shouldBe
      (GeoAlgorithms.area(L) + 8.0) +- 1e-9
  }

  test("traversal is input-order invariant: ops commute where they should") {
    GeoAlgorithms.area(GeoAlgorithms.intersection(box, L)) shouldBe 5.0 +- 1e-9
    GeoAlgorithms.area(GeoAlgorithms.union(box, L)) shouldBe 23.0 +- 1e-9
    GeoAlgorithms.area(GeoAlgorithms.symDifference(box, L)) shouldBe 18.0 +- 1e-9
  }

  // --- Degenerate-contact regime (r8): shared vertices, vertex-on-edge,
  // collinear overlap — previously refused into the envelope fallback,
  // now exact via the refined-subdivision overlay.

  private def areaOf(w: String): Double = GeoAlgorithms.area(w)
  private def ops(a: String, b: String): (Double, Double, Double, Double) = (
    areaOf(GeoAlgorithms.intersection(a, b)),
    areaOf(GeoAlgorithms.union(a, b)),
    areaOf(GeoAlgorithms.difference(a, b)),
    areaOf(GeoAlgorithms.symDifference(a, b)))

  test("adjacent squares sharing a full edge") {
    val a = "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"
    val b = "POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))"
    val (i, u, d, sd) = ops(a, b)
    i shouldBe 0.0 +- 1e-9
    u shouldBe 2.0 +- 1e-9
    d shouldBe 1.0 +- 1e-9
    sd shouldBe 2.0 +- 1e-9
  }

  test("squares sharing exactly one corner (pinch vertex)") {
    val a = "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"
    val b = "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"
    val (i, u, d, sd) = ops(a, b)
    i shouldBe 0.0 +- 1e-9
    u shouldBe 2.0 +- 1e-9
    d shouldBe 1.0 +- 1e-9
    sd shouldBe 2.0 +- 1e-9
  }

  test("triangle vertex resting on a square's edge, crossing out") {
    val a = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"
    val t = "POLYGON ((1 2, 3 1, 3 3, 1 2))"
    val (i, u, d, sd) = ops(a, t)
    val triArea = areaOf(t)
    i shouldBe 0.25 +- 1e-9
    u shouldBe (4.0 + triArea - 0.25) +- 1e-9
    d shouldBe 3.75 +- 1e-9
    sd shouldBe (4.0 + triArea - 0.5) +- 1e-9
  }

  test("overlapping rectangles with collinear top/bottom edges") {
    val a = "POLYGON ((0 0, 2 0, 2 1, 0 1, 0 0))"
    val b = "POLYGON ((1 0, 3 0, 3 1, 1 1, 1 0))"
    val (i, u, d, sd) = ops(a, b)
    i shouldBe 1.0 +- 1e-9
    u shouldBe 3.0 +- 1e-9
    d shouldBe 1.0 +- 1e-9
    sd shouldBe 2.0 +- 1e-9
  }

  test("identical polygons") {
    val a = "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"
    val (i, u, d, sd) = ops(a, a)
    i shouldBe 1.0 +- 1e-9
    u shouldBe 1.0 +- 1e-9
    d shouldBe 0.0 +- 1e-9
    sd shouldBe 0.0 +- 1e-9
  }

  test("corner sub-square sharing two boundary segments") {
    val a = "POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0))"
    val b = "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"
    val (i, u, d, sd) = ops(a, b)
    i shouldBe 1.0 +- 1e-9
    u shouldBe 9.0 +- 1e-9
    d shouldBe 8.0 +- 1e-9
    sd shouldBe 8.0 +- 1e-9
  }

  test("U-shape capped by a bar touching along two collinear segments forms a hole") {
    val u = "POLYGON ((0 0, 3 0, 3 3, 2 3, 2 1, 1 1, 1 3, 0 3, 0 0))"
    val cap = "POLYGON ((0 3, 3 3, 3 4, 0 4, 0 3))"
    val un = GeoAlgorithms.union(u, cap)
    areaOf(un) shouldBe 10.0 +- 1e-9
    // the notch [1,2]x[1,3] is enclosed: one interior ring of area 2
    un should startWith("POLYGON")
    un.count(_ == '(') shouldBe 3 // outer paren + shell + one hole
    areaOf(GeoAlgorithms.intersection(u, cap)) shouldBe 0.0 +- 1e-9
    areaOf(GeoAlgorithms.symDifference(u, cap)) shouldBe 10.0 +- 1e-9
  }

  // --- Interior rings in overlay (r8): holes exact in every regime ----

  test("hole fully covered by the other operand") {
    val a = "POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (2 2, 3 2, 3 3, 2 3, 2 2))"
    val b = "POLYGON ((1 1, 4 1, 4 4, 1 4, 1 1))"
    val (i, u, d, sd) = ops(a, b)
    i shouldBe 8.0 +- 1e-9   // B (9) minus A's hole (1)
    u shouldBe 81.0 +- 1e-9  // hole filled by B
    d shouldBe 72.0 +- 1e-9  // shell minus B, hole subsumed
    sd shouldBe 73.0 +- 1e-9 // 72 + (B − A = the hole, 1)
    areaOf(GeoAlgorithms.difference(b, a)) shouldBe 1.0 +- 1e-9
  }

  test("rect crossing partially into a hole") {
    val a = "POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))"
    val b = "POLYGON ((2 2, 5 2, 5 5, 2 5, 2 2))"
    val (i, u, d, sd) = ops(a, b)
    i shouldBe 8.0 +- 1e-9   // B (9) minus overlap with hole (1)
    u shouldBe 33.0 +- 1e-9  // 32 + 9 − 8
    d shouldBe 24.0 +- 1e-9  // 32 − 8
    sd shouldBe 25.0 +- 1e-9 // 32 + 9 − 2·8
  }

  test("square sharing an edge with a hole (degenerate + hole)") {
    val a = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"
    val b = "POLYGON ((2 1, 3 1, 3 2, 2 2, 2 1))"
    val (i, u, d, sd) = ops(a, b)
    i shouldBe 1.0 +- 1e-9   // B sits in A's solid region, edge on hole
    u shouldBe 15.0 +- 1e-9  // A unchanged
    d shouldBe 14.0 +- 1e-9
    sd shouldBe 14.0 +- 1e-9
  }

  test("island polygon nested inside the other's hole") {
    val a = "POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0), (1 1, 4 1, 4 4, 1 4, 1 1))"
    val b = "POLYGON ((2 2, 3 2, 3 3, 2 3, 2 2))"
    val (i, u, d, sd) = ops(a, b)
    i shouldBe 0.0 +- 1e-9
    u shouldBe 17.0 +- 1e-9  // ring polygon (16) + island (1)
    GeoAlgorithms.union(a, b) should startWith("MULTIPOLYGON")
    d shouldBe 16.0 +- 1e-9
    sd shouldBe 17.0 +- 1e-9
  }

  test("square plugging a hole exactly (all-shared hole boundary)") {
    val a = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"
    val b = "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"
    val (i, u, d, sd) = ops(a, b)
    i shouldBe 0.0 +- 1e-9   // B occupies exactly the hole: no interior overlap
    u shouldBe 16.0 +- 1e-9  // hole plugged
    d shouldBe 15.0 +- 1e-9  // A unchanged
    sd shouldBe 16.0 +- 1e-9
  }

  test("st_touches/st_overlaps are exact for polygon pairs (r8)") {
    val l = "POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))"
    // square filling the notch, sharing two edge segments with L:
    // envelopes properly overlap (envelope heuristic would say NOT
    // touching) but interiors are disjoint with boundary contact
    val notch = "POLYGON ((2 2, 3 2, 3 3, 2 3, 2 2))"
    GeoAlgorithms.touches(l, notch) shouldBe true
    GeoAlgorithms.overlaps(l, notch) shouldBe false
    // square in the notch QUADRANT but clear of L entirely: envelopes
    // properly overlap (envelope heuristic would say overlapping) but
    // the exact intersection is empty with no contact
    val clear = "POLYGON ((2.5 2.5, 5 2.5, 5 5, 2.5 5, 2.5 2.5))"
    GeoAlgorithms.overlaps(l, clear) shouldBe false
    GeoAlgorithms.touches(l, clear) shouldBe false
    // genuine partial overlap
    val over = "POLYGON ((3 1, 5 1, 5 3, 3 3, 3 1))"
    GeoAlgorithms.overlaps(l, over) shouldBe true
    GeoAlgorithms.touches(l, over) shouldBe false
    // containment is NOT overlaps (OGC): box inside L's solid arm
    val inner = "POLYGON ((0.5 0.5, 1.5 0.5, 1.5 1.5, 0.5 1.5, 0.5 0.5))"
    GeoAlgorithms.overlaps(l, inner) shouldBe false
  }

  test("ST_Relate covers boundary-tangent containment and holed regimes (r8)") {
    import graft.functions.GeoAlgorithms.relateMatrix
    // containment with shared-edge tangency (was a declared-out regime)
    relateMatrix("POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0))",
      "POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0))") shouldBe "212F11FF2"
    // within with tangency = transpose regime
    relateMatrix("POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0))",
      "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0))") shouldBe "2FF11F212"
    // containment with point tangency
    relateMatrix("POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0))",
      "POLYGON ((0 0, 3 1, 1 3, 0 0))") shouldBe "212F01FF2"
    // overlap whose boundaries share a collinear segment
    relateMatrix("POLYGON ((0 0, 2 0, 2 1, 0 1, 0 0))",
      "POLYGON ((1 0, 3 0, 3 1, 1 1, 1 0))") shouldBe "212111212"
    // island inside a donut's hole, touching the hole boundary
    relateMatrix("POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (2 2, 6 2, 6 6, 2 6, 2 2))",
      "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))") shouldBe "FF2F11212"
    // concave containment (L-shape strictly containing a square)
    relateMatrix("POLYGON ((0 0, 6 0, 6 2, 2 2, 2 6, 0 6, 0 0))",
      "POLYGON ((3 0.5, 4 0.5, 4 1.5, 3 1.5, 3 0.5))") shouldBe "212FF1FF2"
  }

  test("ST_Relate LINESTRING/POLYGON is exact in every regime (r8)") {
    import graft.functions.GeoAlgorithms.relateMatrix
    val sq = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    // pinned coarse regimes stay identical
    relateMatrix("LINESTRING (1 1, 3 3)", sq) shouldBe "1FF0FF212"
    relateMatrix("LINESTRING (-1 2, 5 2)", sq) shouldBe "101FF0212"
    relateMatrix("LINESTRING (5 5, 7 7)", sq) shouldBe "FF1FF0212"
    // line lying along a boundary edge segment
    relateMatrix("LINESTRING (1 0, 3 0)", sq) shouldBe "F1FF0F212"
    // touch from outside at a line endpoint
    relateMatrix("LINESTRING (4 2, 6 2)", sq) shouldBe "FF1F00212"
    // interior-to-boundary reach
    relateMatrix("LINESTRING (2 2, 4 2)", sq) shouldBe "1FF00F212"
    // through a donut: the hole is EXTERIOR
    val donut = "POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (3 3, 6 3, 6 6, 3 6, 3 3))"
    relateMatrix("LINESTRING (4 4.5, 5 4.5)", donut) shouldBe "FF1FF0212"
    relateMatrix("LINESTRING (1 4.5, 8 4.5)", donut) shouldBe "1010FF212"
    // transpose direction consistent
    relateMatrix(sq, "LINESTRING (1 0, 3 0)") shouldBe "FF2101FF2"
  }

  test("ST_Relate LINESTRING/LINESTRING covers collinear overlap and containment (r8)") {
    import graft.functions.GeoAlgorithms.relateMatrix
    // pinned coarse regimes stay identical
    relateMatrix("LINESTRING (0 0, 4 4)", "LINESTRING (0 4, 4 0)") shouldBe "0F1FF0102"
    relateMatrix("LINESTRING (0 0, 2 2)", "LINESTRING (2 2, 4 0)") shouldBe "FF1F00102"
    relateMatrix("LINESTRING (0 0, 4 0)", "LINESTRING (2 0, 2 2)") shouldBe "F01FF0102"
    relateMatrix("LINESTRING (2 0, 2 2)", "LINESTRING (0 0, 4 0)") shouldBe "FF10F0102"
    relateMatrix("LINESTRING (0 0, 1 1)", "LINESTRING (5 5, 9 9)") shouldBe "FF1FF0102"
    // NEW: collinear partial overlap — interiors share a 1-dim segment
    relateMatrix("LINESTRING (0 0, 2 0)", "LINESTRING (1 0, 3 0)") shouldBe "1010F0102"
    // NEW: proper containment — B's interior entirely within A's
    relateMatrix("LINESTRING (0 0, 4 0)", "LINESTRING (1 0, 2 0)") shouldBe "101FF0FF2"
    // equality up to reversal still short-circuits
    relateMatrix("LINESTRING (0 0, 1 1, 2 0)", "LINESTRING (2 0, 1 1, 0 0)") shouldBe "1FFF0FFF2"
  }

  test("inclusion–exclusion holds on randomized GRID-ALIGNED pairs (degenerate-rich)") {
    val rng = new scala.util.Random(20260814)
    for (_ <- 1 to 200) {
      // integer-aligned L-shape and rect: contacts constantly share
      // vertices/edges — the regime that used to refuse into envelope
      val ox = rng.nextInt(6).toDouble; val oy = rng.nextInt(6).toDouble
      val w = (rng.nextInt(2) + 1) * 2.0; val h = (rng.nextInt(2) + 1) * 2.0
      val a = s"POLYGON (($ox $oy, ${ox + w} $oy, ${ox + w} ${oy + h / 2}, " +
        s"${ox + w / 2} ${oy + h / 2}, ${ox + w / 2} ${oy + h}, $ox ${oy + h}, $ox $oy))"
      val bx = rng.nextInt(8).toDouble; val by = rng.nextInt(8).toDouble
      val bw = rng.nextInt(5) + 1.0; val bh = rng.nextInt(5) + 1.0
      val b = s"POLYGON (($bx $by, ${bx + bw} $by, ${bx + bw} ${by + bh}, " +
        s"$bx ${by + bh}, $bx $by))"
      val areaA = GeoAlgorithms.area(a)
      val areaB = GeoAlgorithms.area(b)
      val inter = GeoAlgorithms.area(GeoAlgorithms.intersection(a, b))
      withClue(s"a=$a b=$b") {
        GeoAlgorithms.area(GeoAlgorithms.union(a, b)) shouldBe
          (areaA + areaB - inter +- 1e-6)
        GeoAlgorithms.area(GeoAlgorithms.difference(a, b)) shouldBe
          (areaA - inter +- 1e-6)
        GeoAlgorithms.area(GeoAlgorithms.symDifference(a, b)) shouldBe
          (areaA + areaB - 2 * inter +- 1e-6)
      }
    }
  }

  test("subdivision overlay cross-validates Greiner–Hormann on general-position pairs") {
    // two independent exact engines must agree wherever both apply:
    // ghClip (entry/exit tracing) on the off-grid pairs it accepts vs
    // the refined-subdivision overlay on the same inputs
    import graft.functions.GeoAlgorithms
    val rng = new scala.util.Random(20260815)
    var compared = 0
    for (_ <- 1 to 150) {
      val ox = rng.nextInt(6) + 0.137; val oy = rng.nextInt(6) + 0.261
      val w = rng.nextInt(4) + 2.0; val h = rng.nextInt(4) + 2.0
      val a = s"POLYGON (($ox $oy, ${ox + w} $oy, ${ox + w} ${oy + h / 2}, " +
        s"${ox + w / 2} ${oy + h / 2}, ${ox + w / 2} ${oy + h}, $ox ${oy + h}, $ox $oy))"
      val bx = rng.nextInt(8) + 0.413; val by = rng.nextInt(8) + 0.617
      val bw = rng.nextInt(5) + 1.0; val bh = rng.nextInt(5) + 1.0
      val b = s"POLYGON (($bx $by, ${bx + bw} $by, ${bx + bw} ${by + bh}, " +
        s"$bx ${by + bh}, $bx $by))"
      val aO = GeoAlgorithms.parseRings(a).head.dropRight(1)
      val bO = GeoAlgorithms.parseRings(b).head.dropRight(1)
      for (op <- Seq("intersection", "union", "difference")) {
        GeoAlgorithms.degenerateOverlay(aO, bO, op).foreach { w2 =>
          val viaGh = op match {
            case "intersection" => GeoAlgorithms.intersection(a, b)
            case "union" => GeoAlgorithms.union(a, b)
            case "difference" => GeoAlgorithms.difference(a, b)
          }
          withClue(s"op=$op a=$a b=$b gh=$viaGh subdiv=$w2") {
            GeoAlgorithms.area(w2) shouldBe GeoAlgorithms.area(viaGh) +- 1e-6
          }
          compared += 1
        }
      }
    }
    compared should be > 300
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
