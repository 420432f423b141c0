package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** geometry_union_agg / convex_hull_agg: the properties that matter on
  * a cluster are partition-order invariance (partial buffers merge in
  * arbitrary order) and bounded buffer state; plus the Presto edge
  * semantics (single-input passthrough, EMPTY, all-null → null).
  */
class GeoAggSpec extends AnyFunSuite with Matchers with SparkFixture {

  private def unionOf(wkts: Seq[String], parts: Int): String = {
    import spark.implicits._
    wkts.toDF("g").repartition(parts)
      .agg(expr("geometry_union_agg(g)")).as[String].head()
  }

  private def hullOf(wkts: Seq[String], parts: Int): String = {
    import spark.implicits._
    wkts.toDF("g").repartition(parts)
      .agg(expr("convex_hull_agg(g)")).as[String].head()
  }

  test("geometry_union_agg is partition-order invariant") {
    val polys = (0 until 40).map { i =>
      s"POLYGON (($i 0, ${i + 2} 0, ${i + 2} 2, $i 2, $i 0))"
    }
    val expected = unionOf(polys, 1)
    unionOf(scala.util.Random.shuffle(polys.toList), 7) shouldBe expected
    unionOf(polys.reverse, 32) shouldBe expected
    // the decomposition keeps one rectangle per contributing strip
    // (it never re-merges parts), but the covered region is exactly
    // [0, 41] × [0, 2]
    expected should startWith("MULTIPOLYGON")
    spark.sql(s"SELECT round(geom_area('$expected'), 4)")
      .head().getDouble(0) shouldBe 82.0
  }

  test("geometry_union_agg edge semantics match the scalar unionArray") {
    // single non-empty input passes through unchanged (not re-enveloped)
    unionOf(Seq("POLYGON ((0 0, 3 0, 0 3, 0 0))"), 3) shouldBe
      "POLYGON ((0 0, 3 0, 0 3, 0 0))"
    // EMPTY-only input → POLYGON EMPTY; nulls are ignored
    unionOf(Seq("POLYGON EMPTY", "LINESTRING EMPTY"), 2) shouldBe "POLYGON EMPTY"
    import spark.implicits._
    Seq.empty[String].toDF("g").agg(expr("geometry_union_agg(g)"))
      .head().isNullAt(0) shouldBe true
    // a dominated envelope contributes nothing, in either arrival order
    val big = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    val small = "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))"
    unionOf(Seq(big, small), 2) shouldBe unionOf(Seq(small, big), 2)
    spark.sql(s"SELECT geom_area(geometry_union_agg(g)) FROM VALUES ('$big'), ('$small') t(g)")
      .head().getDouble(0) shouldBe 100.0
  }

  test("convex_hull_agg is partition-order invariant and compresses state") {
    // 3000 points on a jittered grid inside a planted triangle hull —
    // more than the 1024 compression threshold, so partial buffers
    // must collapse to hull vertices along the way
    val pts = (0 until 3000).map { i =>
      val x = (i % 50) * 0.1 + 1.0; val y = (i / 50) * 0.05 + 1.0
      s"POINT ($x $y)"
    } ++ Seq("POINT (0 0)", "POINT (20 0)", "POINT (0 20)")
    val expected = hullOf(pts, 1)
    hullOf(scala.util.Random.shuffle(pts.toList), 13) shouldBe expected
    expected should startWith("POLYGON")
    spark.sql(s"SELECT round(st_area('$expected'), 4)")
      .head().getDouble(0) shouldBe 200.0
  }

  test("convex_hull_agg degenerate regimes") {
    hullOf(Seq("POINT (5 7)", "POINT (5 7)", "POINT (5 7)"), 2) shouldBe "POINT (5 7)"
    hullOf(Seq("POINT (0 0)", "POINT (2 2)", "POINT (5 5)", "POINT (3 3)"), 2) shouldBe
      "LINESTRING (0 0, 5 5)"
    hullOf(Seq("POLYGON EMPTY"), 1) shouldBe "POLYGON EMPTY"
    // non-point geometries contribute their vertices, like the reference
    hullOf(Seq("POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0))", "POINT (10 1)"), 2) should
      startWith("POLYGON")
  }
}
