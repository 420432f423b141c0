package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-9 fix pins (VERDICT r8 "Next round" items).
  *
  * #1: `window_value` tie-determinism — the only red row in the r8 sf1
  * gate. The synthetic lineitem has duplicate (l_orderkey,
  * l_linenumber) pairs, so a window ordered by l_linenumber alone is
  * not a total order and value-function results depended on file/scan
  * layout. The fix tiebreaks on (l_quantity, l_extendedprice); these
  * specs pin (a) the hazard is real in the data, (b) the extended key
  * IS total, (c) it stays total under DeriveSf1's key-offset
  * replication, and (d) the query now returns identical results under
  * a deliberately fragmented multi-split scan — the exact failure mode
  * the sf1 gate caught.
  */
class Round9FixesSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")

  test("the tie hazard is real: (l_orderkey, l_linenumber) duplicates exist") {
    val dups = lineitem.groupBy("l_orderkey", "l_linenumber")
      .count().filter(col("count") > 1).count()
    dups should be > 0L
  }

  test("window_value's extended ORDER BY key is a total order per partition") {
    val total = lineitem.count()
    val distinct = lineitem
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .distinct().count()
    distinct shouldBe total
  }

  test("DeriveSf1-style replication preserves the total order") {
    // 3-replica key-offset replication of the spec-scale lineitem,
    // mirroring DeriveSf1.replicate (offset keys, perturb price).
    val reps = spark.range(3).select(col("id").as("rep"))
    val rep = lineitem.crossJoin(reps)
      .withColumn("l_orderkey", col("l_orderkey") + col("rep") * 10000000L)
      .withColumn("l_extendedprice",
        col("l_extendedprice") + col("rep") * 1.1e-7)
    val total = rep.count()
    val distinct = rep
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .distinct().count()
    distinct shouldBe total
  }

  test("window_value is invariant under a fragmented multi-split scan") {
    def rows(name: String): Seq[String] =
      SparkEntry.queries(name)(spark, sfDir)
        .collect().map(_.toString).sorted.toSeq

    val key = "spark.sql.files.maxPartitionBytes"
    val prev = spark.conf.get(key)
    val singleValue = rows("window_value")
    val singleFrames = rows("window_agg_frames") // also tie-hardened this round
    try {
      // force many input splits so scan order differs from the
      // single-file sequential read the sf0.01 gate always sees
      spark.conf.set(key, "16384")
      rows("window_value") shouldBe singleValue
      rows("window_agg_frames") shouldBe singleFrames
    } finally spark.conf.set(key, prev)
    singleValue.size should be > 0
  }

  // --- geometry robustness pins (r9 ADVICE items) ---------------------

  import graft.functions.GeoAlgorithms.relateMatrix

  test("polygon/polygon relate: shell-coincident containment with a hole") {
    // A = [0,3]^2; B = same shell minus hole [1,2]^2. A contains B, the
    // shells coincide, so A's boundary never meets B's exterior:
    // BE must be 'F' (the old hardcoded contains-matrix said '1'),
    // and B's hole ring lies in A's interior: IB = '1'.
    val a = "POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0))"
    val b = "POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"
    relateMatrix(a, b) shouldBe "212F1FFF2"
    // and the transposed regime (within) is consistent
    relateMatrix(b, a) shouldBe "2FF11F2F2"
  }

  test("polygon/polygon relate: hole-driven overlap with disjoint boundaries") {
    // B = shell [0,10]^2 with hole [3,7]^2; A = [2,8]^2: interiors
    // partially overlap but the boundaries never touch — BB must be
    // 'F' (the old overlap branch coerced it to '0').
    val a = "POLYGON ((2 2, 8 2, 8 8, 2 8, 2 2))"
    val b = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))"
    relateMatrix(a, b) shouldBe "2121FF212"
    relateMatrix(b, a) shouldBe "2121F12F2" // the transpose
  }

  test("line/polygon relate: a backtracking line does not fake full boundary coverage") {
    // the line retraces the bottom edge 4 times: summed sub-segment
    // length (16) reaches the perimeter (16) but actual coverage is
    // one edge of length 4 — EB must stay '1'
    val line = "LINESTRING (0 0, 4 0, 0 0, 4 0, 0 0, 4 0, 0 0, 4 0, 0 0)"
    val poly = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    val m = relateMatrix(line, poly)
    m.charAt(7) shouldBe '1' // EB
    m.charAt(1) shouldBe '1' // IB: the line lies on the boundary
  }

  test("relate classifies computed points on non-axis-aligned boundaries") {
    // line collinear with a diagonal polygon edge: refined midpoints
    // are computed with rounding; the eps-tolerant incidence test must
    // still classify them as boundary contact (IB = '1', II = 'F')
    val poly = "POLYGON ((0.1 0.1, 0.7 0.3, 0.4 0.9, 0.1 0.1))"
    val line = "LINESTRING (0.1 0.1, 0.7 0.3)"
    val m = relateMatrix(line, poly)
    m.charAt(1) shouldBe '1' // IB: interior of line on boundary
    m.charAt(0) shouldBe 'F' // II: never inside
    // a strict sub-segment of that edge behaves the same
    val sub = "LINESTRING (0.25 0.15, 0.55 0.25)"
    val m2 = relateMatrix(sub, poly)
    m2.charAt(1) shouldBe '1'
    m2.charAt(0) shouldBe 'F'
  }

  test("point/linestring relate and point-in-hole classification") {
    // the previously-missing POINT/LINESTRING regime
    val line = "LINESTRING (0 0, 4 0, 4 4)"
    relateMatrix("POINT (2 0)", line) shouldBe "0FFFFF102"   // on interior
    relateMatrix("POINT (0 0)", line) shouldBe "F0FFFF102"   // on boundary
    relateMatrix("POINT (9 9)", line) shouldBe "FF0FFF102"   // disjoint
    relateMatrix(line, "POINT (2 0)") shouldBe "0F1FF0FF2"   // transpose
    // closed line: no boundary
    val ring = "LINESTRING (0 0, 4 0, 4 4, 0 0)"
    relateMatrix("POINT (2 0)", ring) shouldBe "0FFFFF1F2"
    // point inside a polygon's hole is in the polygon's EXTERIOR,
    // and the hole ring is polygon boundary
    val holed = "POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (3 3, 6 3, 6 6, 3 6, 3 3))"
    relateMatrix("POINT (4 4)", holed) shouldBe "FF0FFF212"
    relateMatrix("POINT (3 4)", holed) shouldBe "F0FFFF212"
    relateMatrix("POINT (1 1)", holed) shouldBe "0FFFFF212"
  }

  test("MULTIPOINT relate regimes as finite point sets") {
    // set relations
    relateMatrix("MULTIPOINT (1 1, 2 2)", "MULTIPOINT (2 2, 3 3)") shouldBe
      "0F0FFF0F2"
    relateMatrix("MULTIPOINT (1 1, 2 2)", "MULTIPOINT (1 1, 2 2)") shouldBe
      "0FFFFFFF2"
    relateMatrix("POINT (1 1)", "MULTIPOINT (1 1, 2 2)") shouldBe "0FFFFF0F2"
    // vs polygon: one in, one on boundary, one out
    val poly = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    relateMatrix("MULTIPOINT (1 1, 4 2, 9 9)", poly) shouldBe "000FFF212"
    relateMatrix(poly, "MULTIPOINT (1 1)") shouldBe "0F2FF1FF2" // transpose
    // vs line: covering both endpoints flips EB to F
    val line = "LINESTRING (0 0, 4 0)"
    relateMatrix("MULTIPOINT (0 0, 4 0, 2 0)", line) shouldBe "00FFFF1F2"
    relateMatrix("MULTIPOINT (0 0, 9 9)", line) shouldBe "F00FFF102"
  }

  test("MULTIPOLYGON overlay and relate ride the subdivision engine") {
    import graft.functions.GeoAlgorithms
    // two disjoint unit squares vs a rectangle containing only the first
    val mp = "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 0, 6 0, 6 1, 5 1, 5 0)))"
    val big = "POLYGON ((-1 -1, 2 -1, 2 2, -1 2, -1 -1))"
    // exact intersection = just the first part (area 1)
    val inter = GeoAlgorithms.intersection(mp, big)
    GeoAlgorithms.area(inter) shouldBe 1.0 +- 1e-9
    // relate: part1 strictly inside big, part2 disjoint from it
    relateMatrix(mp, big) shouldBe "2F21F1212"
    relateMatrix(big, mp) shouldBe "212FF1212" // transpose
    // multipolygon containing a polygon: B inside part2
    val b2 = "POLYGON ((5.2 0.2, 5.8 0.2, 5.8 0.8, 5.2 0.8, 5.2 0.2))"
    relateMatrix(mp, b2) shouldBe "212FF1FF2"
    // point-set and line regimes against a multipolygon
    relateMatrix("MULTIPOINT (0.5 0.5, 5.5 0.5, 3 3)", mp) shouldBe "0F0FFF212"
    relateMatrix("LINESTRING (0.2 0.5, 0.8 0.5)", mp).charAt(0) shouldBe '1'
  }

  test("MULTILINESTRING relate: mod-2 boundary and multi-part refinement") {
    // two parts joined end-to-end: the seam (4 0) ends BOTH parts, so
    // by the mod-2 rule it is INTERIOR; the line set's boundary is
    // {(0 0), (4 4)} — against the same path as one LINESTRING the
    // matrices must agree
    val ml = "MULTILINESTRING ((0 0, 4 0), (4 0, 4 4))"
    val sl = "LINESTRING (0 0, 4 0, 4 4)"
    relateMatrix(ml, sl) shouldBe "1FFF0FFF2" // equal as point sets
    relateMatrix(sl, ml) shouldBe "1FFF0FFF2"
    // point at the seam is line-INTERIOR, not boundary
    relateMatrix("POINT (4 0)", ml) shouldBe "0FFFFF102"
    // point at a true end is boundary
    relateMatrix("POINT (4 4)", ml) shouldBe "F0FFFF102"
    // crossing line vs multi-part
    relateMatrix("LINESTRING (2 -1, 2 1)", ml) shouldBe
      relateMatrix("LINESTRING (2 -1, 2 1)", sl)
    // multilinestring vs polygon: one part inside, one outside
    val poly = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    val ml2 = "MULTILINESTRING ((1 1, 2 2), (20 20, 30 30))"
    val m = relateMatrix(ml2, poly)
    m.charAt(0) shouldBe '1' // II: first part inside
    m.charAt(2) shouldBe '1' // IE: second part outside
    m.charAt(3) shouldBe '0' // BI: endpoints (1 1),(2 2) in interior
    m.charAt(5) shouldBe '0' // BE: endpoints (20 20),(30 30) outside
  }

  test("st_contains with non-point operands uses the full geometry") {
    import graft.functions.GeoAlgorithms.containsGeom
    val poly = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    // a line whose FIRST vertex is inside but which exits the polygon —
    // the old first-vertex reduction would say contained
    containsGeom(poly, "LINESTRING (1 1, 20 1)") shouldBe false
    containsGeom(poly, "LINESTRING (1 1, 9 9)") shouldBe true
    // line on the boundary only: no interior intersection → false
    containsGeom(poly, "LINESTRING (0 0, 10 0)") shouldBe false
    // polygon operands
    containsGeom(poly, "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))") shouldBe true
    containsGeom(poly, "POLYGON ((8 8, 12 8, 12 12, 8 12, 8 8))") shouldBe false
    // multi operands
    containsGeom(poly,
      "MULTIPOINT (1 1, 9 9)") shouldBe true
    containsGeom(poly,
      "MULTIPOINT (1 1, 11 11)") shouldBe false
    // point fast path unchanged
    containsGeom(poly, "POINT (5 5)") shouldBe true
    containsGeom(poly, "POINT (15 5)") shouldBe false
  }

  test("explain_analyze surfaces actual per-operator runtime metrics") {
    import spark.implicits._
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val q = orders.filter($"o_totalprice" > 100000.0)
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
    val metrics = graft.plans.ExplainAnalyze.analyze(spark, q)
      .filter($"metric" === "numOutputRows")
      .select("operator", "value").as[(String, Long)].collect()
    // the walk reached a scan, an exchange, and the aggregates
    metrics.map(_._1).exists(_.contains("Scan")) shouldBe true
    metrics.map(_._1).count(_.contains("HashAggregate")) should be >= 2
    // actual (not estimated) values: the final aggregate emitted
    // exactly the query's result rows, the scan the table's rows
    val resultRows = q.count()
    metrics.filter(_._1.contains("HashAggregate")).map(_._2)
      .min shouldBe resultRows
    metrics.filter(_._1.contains("Scan")).map(_._2)
      .max shouldBe orders.count()
  }
}
