package graft

import graft.functions.{GeoAlgorithms, SetDigestBuffer}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Regression pins for the round-3 review findings. */
class ReviewFixesSpec extends AnyFunSuite with SparkFixture with Matchers {

  test("histogram over STRING keys matches groupBy (no buffer aliasing)") {
    import spark.implicits._
    Tables.registerAll(spark, sfDir)
    val hist = spark.sql(
      """SELECT array_join(transform(array_sort(map_entries(histogram(c_mktsegment))),
        |  e -> concat(e.key, ':', cast(e.value AS STRING))), ',') AS h
        |FROM customer""".stripMargin).head().getString(0)
    val expected = Tables.customer(spark, sfDir)
      .groupBy($"c_mktsegment").count()
      .collect().map(r => s"${r.getString(0)}:${r.getLong(1)}")
      .sorted.mkString(",")
    hist shouldBe expected
  }

  test("multimap_agg over STRING keys and values matches collect_list") {
    Tables.registerAll(spark, sfDir)
    val row = spark.sql(
      """SELECT size(m) AS n_keys,
        |  size(m['BUILDING']) AS n_building
        |FROM (SELECT multimap_agg(c_mktsegment, c_name) AS m FROM customer)""".stripMargin)
      .head()
    val expected = Tables.customer(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("c_mktsegment") === "BUILDING").count()
    row.getInt(0) shouldBe 5
    row.getInt(1).toLong shouldBe expected
  }

  test("merge() rejects mixed sketch families instead of silently dropping") {
    Tables.registerAll(spark, sfDir)
    val ex = intercept[Exception] {
      spark.sql(
        """SELECT merge(sk) FROM (
          |  SELECT make_set_digest(c_custkey) AS sk FROM customer
          |  UNION ALL
          |  SELECT hll_sketch_agg(c_custkey) AS sk FROM customer)""".stripMargin)
        .collect()
    }
    ex.getMessage should include("mixed sketch families")
  }

  test("set digest cardinality is exact at exactly k elements") {
    val buf = new SetDigestBuffer(64)
    (1 to 64).foreach(i => buf.addHash(SetDigestBuffer.hashValue(i.toLong)))
    buf.cardinality shouldBe 64L
    // the 65th distinct element starts estimating
    buf.addHash(SetDigestBuffer.hashValue(65L))
    val est = buf.cardinality
    est should be >= 40L
    est should be <= 90L
    // eviction state survives serialization
    val rt = SetDigestBuffer.deserialize(buf.serialize())
    rt.cardinality shouldBe est
  }

  test("geometry functions compose through POLYGON EMPTY") {
    val empty = GeoAlgorithms.intersection(
      "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
      "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))")
    empty shouldBe "POLYGON EMPTY"
    val sq = "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"
    GeoAlgorithms.union(empty, sq) shouldBe sq
    GeoAlgorithms.union(sq, empty) shouldBe sq
    GeoAlgorithms.intersection(empty, sq) shouldBe "POLYGON EMPTY"
    GeoAlgorithms.difference(sq, empty) shouldBe sq
    GeoAlgorithms.difference(empty, sq) shouldBe "POLYGON EMPTY"
    GeoAlgorithms.symDifference(empty, sq) shouldBe sq
    GeoAlgorithms.touches(empty, sq) shouldBe false
    GeoAlgorithms.overlaps(sq, empty) shouldBe false
    GeoAlgorithms.crosses("LINESTRING EMPTY", sq) shouldBe false
    GeoAlgorithms.isSimple("POLYGON EMPTY") shouldBe true
    GeoAlgorithms.containsPoint("POLYGON EMPTY", 0.5, 0.5) shouldBe false
    GeoAlgorithms.area(GeoAlgorithms.union(empty, sq)) shouldBe 1.0
  }

  test("hamming_distance validates lengths and handles empty strings") {
    spark.sql("SELECT hamming_distance('abcd', 'abzd') AS d").head().getLong(0) shouldBe 1L
    spark.sql("SELECT hamming_distance('', '') AS d").head().getLong(0) shouldBe 0L
    val ex = intercept[Exception] {
      spark.sql("SELECT hamming_distance('ab', 'abc')").collect()
    }
    ex.getMessage should include("same length")
  }

  // --- round-4 review findings (ADVICE r3) ----------------------------

  test("set digest serialization round-trips at wire version 2") {
    val buf = new SetDigestBuffer(4)
    (1 to 10).foreach(i => buf.addHash(i.toLong * 7919, 1)) // forces eviction
    val back = SetDigestBuffer.deserialize(buf.serialize())
    back.cardinality shouldBe buf.cardinality
    // pre-bump version-1 bytes must be rejected, not misparsed
    val bytes = buf.serialize()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.putInt(0, 1)
    val ex = intercept[IllegalArgumentException] {
      SetDigestBuffer.deserialize(bytes)
    }
    ex.getMessage should include("version")
  }

  test("5-arg color() clamps a zero-width range like the reference") {
    // high == low: Java division gives ±Infinity which Presto clamps to
    // the boundary color; Spark's NULL-on-/0 must not leak through
    val r = spark.sql(
      """SELECT render('hi', color(5.0, 2.0, 2.0, rgb(255, 0, 0), rgb(0, 255, 0))) AS above,
        |       render('lo', color(1.0, 2.0, 2.0, rgb(255, 0, 0), rgb(0, 255, 0))) AS below""".stripMargin)
      .head()
    r.getString(0) should not be null
    r.getString(1) should not be null
    r.getString(0) should not be r.getString(1) // high color vs low color
  }

  test("evaluate_classifier_predictions merge path honors the label guard") {
    val a = new graft.functions.EvalPredsBuffer
    a.add("x", "x")
    val b = new graft.functions.EvalPredsBuffer
    b.add("y", "y")
    a.mergeWith(b) // existing-key and under-budget merges still work
    a.summary should include("Accuracy: 2/2")
  }

  // ---- round-4 review (ADVICE r4) regression pins ----

  test("spatial_partitioning skips EMPTY geometries; spatial_partitions returns NULL") {
    Tables.registerAll(spark, sfDir)
    val tree = spark.sql(
      """SELECT spatial_partitioning(g, 4) AS t FROM (
        |  SELECT concat('POINT (', id, ' ', id, ')') AS g FROM range(16)
        |  UNION ALL SELECT 'POLYGON EMPTY' AS g
        |  UNION ALL SELECT 'POINT EMPTY' AS g)""".stripMargin).head().getString(0)
    tree should include("leaf") // empties did not crash the aggregate
    val r = spark.sql(
      s"""SELECT spatial_partitions('$tree', 'POLYGON EMPTY') AS a,
         |  spatial_partitions('$tree', 'POINT EMPTY', 1.0) AS b,
         |  spatial_partitions('$tree', 'POINT (3 3)') AS c""".stripMargin).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && !r.isNullAt(2))
  }

  test("spatial_partitions rejects NaN/infinite/negative distance") {
    Tables.registerAll(spark, sfDir)
    val tree = spark.sql(
      """SELECT spatial_partitioning(concat('POINT (', id, ' ', id, ')'), 4)
        |FROM range(16)""".stripMargin).head().getString(0)
    Seq("cast('NaN' AS DOUBLE)" -> "distance is NaN",
        "cast('Infinity' AS DOUBLE)" -> "distance is infinite",
        "-1.0" -> "distance is negative").foreach { case (d, msg) =>
      val ex = intercept[Exception] {
        spark.sql(s"SELECT spatial_partitions('$tree', 'POINT (1 1)', $d)").collect()
      }
      ex.getMessage should include(msg)
    }
  }

  test("geometry_union_agg buffer serializes WKT past the 64 KiB writeUTF cap") {
    // one many-vertex polygon as a group's sole input must survive the
    // partial-agg serialize/deserialize round trip
    val n = 9000 // ~70 KB of WKT text
    val ring = (0 until n).map(i => f"${math.cos(i * 2 * math.Pi / n)}%.6f " +
      f"${math.sin(i * 2 * math.Pi / n)}%.6f").mkString(", ")
    val wkt = s"POLYGON (($ring, ${"%.6f".format(1.0)} ${"%.6f".format(0.0)}))"
    wkt.length should be > 65535
    val buf = new graft.functions.GeomUnionBuffer
    buf.addWkt(wkt)
    val rt = graft.functions.GeomUnionBuffer.deserialize(buf.serialize())
    rt.result() shouldBe wkt
  }

  test("geometry_union_agg of two geometries equals scalar st_union") {
    Tables.registerAll(spark, sfDir)
    // non-rectangle pair → the exact Greiner–Hormann regime; the agg
    // must agree with the scalar union on area (within rounding)
    val r = spark.sql(
      """WITH two AS (
        |  SELECT 'POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))' AS g
        |  UNION ALL SELECT 'POLYGON ((1 1, 5 1, 5 5, 1 5, 1 1))' AS g)
        |SELECT round(geom_area(geometry_union_agg(g)), 6) AS agg_area,
        |  (SELECT round(geom_area(st_union(
        |     'POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))',
        |     'POLYGON ((1 1, 5 1, 5 5, 1 5, 1 1))')), 6)) AS scalar_area
        |FROM two""".stripMargin).head()
    r.getDouble(0) shouldBe r.getDouble(1)
  }

  test("graft_mem append with a different schema is rejected, not corrupted") {
    import spark.implicits._
    Seq((1, "a")).toDF("id", "s").write.format("graft_mem")
      .option("name", "schema_guard").mode("overwrite").save()
    val ex = intercept[Exception] {
      // same column names, swapped order → different UnsafeRow layout
      Seq(("b", 2)).toDF("s", "id").write.format("graft_mem")
        .option("name", "schema_guard").mode("append").save()
    }
    ex.getMessage should include("does not match stored schema")
    // matching-schema append still works
    Seq((3, "c")).toDF("id", "s").write.format("graft_mem")
      .option("name", "schema_guard").mode("append").save()
    spark.read.format("graft_mem").option("name", "schema_guard")
      .load().count() shouldBe 2
  }
}
