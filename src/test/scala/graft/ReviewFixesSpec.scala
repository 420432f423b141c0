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
}
