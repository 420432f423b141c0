package graft

import graft.functions.{BetaDist, GeoAlgorithms, HyperplaneLsh, SetDigestBuffer}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Seeded randomized-property checks over the round-3 pure-Scala cores
  * (same rationale as [[PropertySpec]]). */
class Round3PropertySpec extends AnyFunSuite with Matchers {
  private val rng = new scala.util.Random(1234)

  private def randPts(n: Int): Seq[(Double, Double)] =
    Seq.fill(n)((rng.nextInt(200) / 10.0, rng.nextInt(200) / 10.0)).distinct

  test("convex hull contains every input point; vertices are inputs") {
    for (_ <- 1 to 200) {
      val pts = randPts(rng.nextInt(30) + 4)
      val wkt = "MULTIPOINT (" +
        pts.map { case (x, y) => s"$x $y" }.mkString(", ") + ")"
      val hull = GeoAlgorithms.convexHull(wkt)
      if (hull.startsWith("POLYGON")) {
        // every hull vertex is one of the inputs
        val hv = GeoAlgorithms.parseCoords(hull).toSet
        hv.subsetOf(pts.toSet + pts.head) shouldBe true
        // every input is inside or on the hull: nudge inward via the
        // centroid mix and ray-cast (strict interior check)
        val cx = pts.map(_._1).sum / pts.size
        val cy = pts.map(_._2).sum / pts.size
        pts.foreach { case (x, y) =>
          val (ix, iy) = (x * 0.999 + cx * 0.001, y * 0.999 + cy * 0.001)
          GeoAlgorithms.containsPoint(hull, ix, iy) shouldBe true
        }
      }
    }
  }

  test("WKB round-trips every geometry kind with exact coordinates") {
    for (_ <- 1 to 200) {
      val pts = randPts(rng.nextInt(6) + 2)
      val coords = pts.map { case (x, y) => s"$x $y" }.mkString(", ")
      val geoms = Seq(
        s"POINT (${pts.head._1} ${pts.head._2})",
        s"LINESTRING ($coords)",
        s"MULTIPOINT ($coords)",
        s"POLYGON (($coords, ${pts.head._1} ${pts.head._2}))")
      geoms.foreach { g =>
        val rt = GeoAlgorithms.fromBinary(GeoAlgorithms.asBinary(g))
        GeoAlgorithms.parseCoords(rt).toSeq shouldBe GeoAlgorithms.parseCoords(g).toSeq
      }
    }
  }

  test("envelope union/difference/intersection satisfy the area identity") {
    for (_ <- 1 to 300) {
      def rect(): String = {
        val x0 = rng.nextInt(50); val y0 = rng.nextInt(50)
        val x1 = x0 + rng.nextInt(30) + 1; val y1 = y0 + rng.nextInt(30) + 1
        s"POLYGON (($x0 $y0, $x1 $y0, $x1 $y1, $x0 $y1, $x0 $y0))"
      }
      val (a, b) = (rect(), rect())
      val areaA = GeoAlgorithms.area(a)
      val areaB = GeoAlgorithms.area(b)
      val inter = GeoAlgorithms.area(GeoAlgorithms.intersection(a, b))
      GeoAlgorithms.area(GeoAlgorithms.union(a, b)) shouldBe
        (areaA + areaB - inter +- 1e-9)
      GeoAlgorithms.area(GeoAlgorithms.difference(a, b)) shouldBe
        (areaA - inter +- 1e-9)
      GeoAlgorithms.area(GeoAlgorithms.symDifference(a, b)) shouldBe
        (areaA + areaB - 2 * inter +- 1e-9)
    }
  }

  test("beta cdf is monotone with a correct inverse on random (a, b)") {
    for (_ <- 1 to 200) {
      val a = rng.nextDouble() * 5 + 0.1
      val b = rng.nextDouble() * 5 + 0.1
      val xs = Seq.fill(10)(rng.nextDouble()).sorted
      val cs = xs.map(BetaDist.cdf(a, b, _))
      cs shouldBe cs.sorted
      xs.zip(cs).foreach { case (x, c) =>
        BetaDist.inverseCdf(a, b, c) shouldBe (x +- 1e-7)
      }
    }
  }

  test("set digest merge is associative and exact under k") {
    for (_ <- 1 to 100) {
      val xs = Seq.fill(rng.nextInt(500) + 1)(rng.nextInt(10000).toLong)
      val (l, r) = xs.splitAt(rng.nextInt(xs.length))
      val whole = new SetDigestBuffer(8192)
      xs.foreach(v => whole.addHash(SetDigestBuffer.hashValue(v)))
      val left = new SetDigestBuffer(8192)
      l.foreach(v => left.addHash(SetDigestBuffer.hashValue(v)))
      val right = new SetDigestBuffer(8192)
      r.foreach(v => right.addHash(SetDigestBuffer.hashValue(v)))
      left.mergeWith(right)
      left.cardinality shouldBe xs.distinct.size.toLong
      left.cardinality shouldBe whole.cardinality
      // serialization round-trip preserves the digest
      SetDigestBuffer.deserialize(left.serialize()).cardinality shouldBe left.cardinality
    }
  }

  test("set digest jaccard is exact for sets under k") {
    for (_ <- 1 to 100) {
      val universe = 2000
      val sa = Seq.fill(rng.nextInt(400) + 50)(rng.nextInt(universe).toLong).distinct.toSet
      val sb = Seq.fill(rng.nextInt(400) + 50)(rng.nextInt(universe).toLong).distinct.toSet
      val da = new SetDigestBuffer(8192)
      sa.foreach(v => da.addHash(SetDigestBuffer.hashValue(v)))
      val db = new SetDigestBuffer(8192)
      sb.foreach(v => db.addHash(SetDigestBuffer.hashValue(v)))
      val expected = sa.intersect(sb).size.toDouble / sa.union(sb).size
      SetDigestBuffer.jaccard(da, db) shouldBe (expected +- 1e-12)
      SetDigestBuffer.intersectionCardinality(da, db) shouldBe
        sa.intersect(sb).size.toLong
    }
  }

  test("KMV cardinality estimate within 5% beyond k") {
    val k = 256
    val buf = new SetDigestBuffer(k)
    val n = 200000
    (0 until n).foreach(v => buf.addHash(SetDigestBuffer.hashValue(v.toLong)))
    // standard error of KMV is ~1/sqrt(k-2) ≈ 6.3%; this fixed seedless
    // input is deterministic, checked at 3 sigma equivalent margin
    math.abs(buf.cardinality - n).toDouble / n should be < 0.15
  }

  test("hyperplane band signatures: identical vectors collide, random mostly differ") {
    for (_ <- 1 to 50) {
      val v = Array.fill(64)(rng.nextDouble() * 2 - 1)
      val sig1 = HyperplaneLsh.compute(new GenericArrayData(v))
      val sig2 = HyperplaneLsh.compute(new GenericArrayData(v.clone()))
      (0 until HyperplaneLsh.NBands).foreach(b =>
        sig1.getLong(b) shouldBe sig2.getLong(b))
      val w = Array.fill(64)(rng.nextDouble() * 2 - 1)
      val sigW = HyperplaneLsh.compute(new GenericArrayData(w))
      // unrelated vectors should not collide on every band
      (0 until HyperplaneLsh.NBands).count(b =>
        sig1.getLong(b) == sigW.getLong(b)) should be < HyperplaneLsh.NBands
    }
  }

  test("HSB interpolation endpoints are exact for random colors") {
    import graft.functions.ColorOps
    for (_ <- 1 to 500) {
      val a = rng.nextInt(0x1000000).toLong
      val b = rng.nextInt(0x1000000).toLong
      ColorOps.interpolate(0.0, a, b) shouldBe a
      ColorOps.interpolate(1.0, a, b) shouldBe b
      ColorOps.interpolate(rng.nextDouble(), a, a) shouldBe a
    }
  }

  test("bar always renders exactly `width` cells and one reset") {
    import graft.functions.ColorOps
    for (_ <- 1 to 200) {
      val width = rng.nextInt(40) + 1
      val p = rng.nextDouble() * 1.4 - 0.2 // exercise both clamps
      val s = ColorOps.bar(p, width, 0xff0000L, 0x00ff00L)
      val blocks = s.count(_ == '█')
      val pad = s.reverse.takeWhile(_ == ' ').length
      blocks + pad shouldBe width
      s.sliding(4).count(_ == "[0m") shouldBe 1
    }
  }

  test("teradata format translation round-trips through format+parse") {
    import graft.functions.TeradataDatetime
    import java.time.format.DateTimeFormatter
    val dateFmts = Seq("yyyy-mm-dd", "dd.mm.yyyy", "mm/dd/yyyy")
    val tsFmts = Seq("yyyy/mm/dd hh24:mi:ss", "yyyy-mm-dd hh24:mi:ss")
    for (_ <- 1 to 200) {
      val ts = java.time.LocalDateTime.of(
        1970 + rng.nextInt(80), 1 + rng.nextInt(12), 1 + rng.nextInt(28),
        rng.nextInt(24), rng.nextInt(60), rng.nextInt(60))
      dateFmts.foreach { fmt =>
        val j = DateTimeFormatter.ofPattern(TeradataDatetime.translateFormat(fmt))
        val printed = ts.toLocalDate.format(j)
        java.time.LocalDate.parse(printed, j) shouldBe ts.toLocalDate
      }
      tsFmts.foreach { fmt =>
        val j = DateTimeFormatter.ofPattern(TeradataDatetime.translateFormat(fmt))
        val printed = ts.format(j)
        java.time.LocalDateTime.parse(printed, j) shouldBe ts
      }
    }
  }
}
