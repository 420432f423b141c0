package graft

import graft.functions.{Erf, GraftExtensions, GraftFunctions, Hmac}
import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class GraftFunctionsSpec extends AnyFunSuite with SparkFixture with Matchers {

  test("all custom functions resolve through the session registry") {
    GraftFunctions.all.map(_._1).foreach { name =>
      withClue(name) {
        spark.sessionState.functionRegistry
          .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)) shouldBe true
      }
    }
  }

  test("GraftExtensions injects the same function set") {
    // the extensions path is what external sessions use via
    // spark.sql.extensions=graft.functions.GraftExtensions
    noException should be thrownBy new GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("erf matches known values") {
    Erf.compute(0.0) shouldBe 0.0 +- 1e-7
    Erf.compute(1.0) shouldBe 0.8427008 +- 1e-6
    Erf.compute(-1.0) shouldBe -0.8427008 +- 1e-6
    Erf.compute(2.0) shouldBe 0.9953223 +- 1e-6
  }

  test("probit inverts the normal cdf") {
    for (p <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val x = Erf.probit(p)
      val backP = 0.5 * (1.0 + Erf.compute(x / math.sqrt(2.0)))
      backP shouldBe p +- 1e-4
    }
  }

  test("probit is NaN outside (0,1)") {
    Erf.probit(0.0).isNaN shouldBe true
    Erf.probit(1.0).isNaN shouldBe true
  }

  test("hmac-sha256 matches RFC 4231 test case 1") {
    // key = 0x0b*20 is binary; use the string-key case 2 instead
    Hmac.compute("HmacSHA256", "what do ya want for nothing?", "Jefe") shouldBe
      "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843"
  }

  test("erf/probit work through SQL with codegen") {
    import spark.implicits._
    val r = spark.sql("SELECT round(erf(1.0), 6) AS e, round(probit(0.5), 6) AS p")
      .as[(Double, Double)].head()
    r._1 shouldBe 0.842701 +- 1e-5
    r._2 shouldBe 0.0 +- 1e-9
  }

  test("map_agg collects key-value pairs; map_union merges maps") {
    import spark.implicits._
    Seq(("a", "x", 1L), ("a", "y", 2L), ("b", "z", 3L))
      .toDF("g", "k", "v").createOrReplaceTempView("mat")
    val m = spark.sql(
      """SELECT g, map_agg(k, v) AS m FROM mat GROUP BY g ORDER BY g""")
      .as[(String, Map[String, Long])].collect()
    m(0) shouldBe ("a", Map("x" -> 1L, "y" -> 2L))
    m(1) shouldBe ("b", Map("z" -> 3L))
    val u = spark.sql(
      """SELECT map_union(m) AS u FROM (
        |  SELECT map(k, v) AS m FROM mat WHERE g = 'a')""".stripMargin)
      .as[Map[String, Long]].head()
    u shouldBe Map("x" -> 1L, "y" -> 2L)
  }

  test("reduce_agg folds with the input lambda") {
    import spark.implicits._
    Seq(1L, 2L, 3L, 4L).toDF("x").createOrReplaceTempView("rat")
    spark.sql(
      """SELECT reduce_agg(x, CAST(1 AS BIGINT),
        |  (s, v) -> s * v, (a, b) -> a * b) AS p FROM rat""".stripMargin)
      .as[Long].head() shouldBe 24L
  }

  test("qdigest: group sketches merge to the global quantile within error") {
    import spark.implicits._
    (1 to 10000).map(i => (i % 7, i.toDouble)).toDF("g", "x")
      .createOrReplaceTempView("qdt")
    val med = spark.sql(
      """SELECT value_at_quantile(merge_qdigest(sk), 0.5D) AS m FROM (
        |  SELECT g, qdigest_agg(x) AS sk FROM qdt GROUP BY g)""".stripMargin)
      .as[Double].head()
    // KLL k=200 → ±1.7% rank error at 99%; median of 1..10000 is 5000
    med shouldBe 5000.0 +- 400.0

    val (qs, rank) = spark.sql(
      """SELECT values_at_quantiles(sk, array(0.1D, 0.9D)) AS v,
        |  quantile_at_value(sk, 2500.0D) AS r
        |FROM (SELECT qdigest_agg(x) AS sk FROM qdt)""".stripMargin)
      .as[(Seq[Double], Double)].head()
    qs(0) shouldBe 1000.0 +- 400.0
    qs(1) shouldBe 9000.0 +- 400.0
    rank shouldBe 0.25 +- 0.04
  }

  test("try returns NULL on runtime error, value on success") {
    import spark.implicits._
    val r = spark.sql(
      """SELECT try(1 div 0) AS a, try(CAST('zz' AS INT)) AS b,
        |  try(element_at(array(7), 0)) AS c, try(2 + 3) AS d""".stripMargin)
      .select($"a".isNull, $"b".isNull, $"c".isNull, $"d")
      .as[(Boolean, Boolean, Boolean, Long)].head()
    r shouldBe ((true, true, true, 5L))
  }

  test("big-endian and ieee754 round-trips are exact, bytes are big-endian") {
    import spark.implicits._
    val r = spark.sql(
      """SELECT from_big_endian_64(to_big_endian_64(-123456789012345678L)) AS a,
        |  from_big_endian_32(to_big_endian_32(-42)) AS b,
        |  from_ieee754_64(to_ieee754_64(3.14159265358979D)) AS c,
        |  hex(to_big_endian_32(1)) AS d,
        |  hex(to_ieee754_64(1.0D)) AS e""".stripMargin)
      .as[(Long, Int, Double, String, String)].head()
    r._1 shouldBe -123456789012345678L
    r._2 shouldBe -42
    r._3 shouldBe 3.14159265358979
    r._4 shouldBe "00000001"
    r._5 shouldBe "3FF0000000000000" // IEEE754 bits of 1.0, big-endian
  }

  test("geo tier: point accessors, distance, containment, shoelace area") {
    import spark.implicits._
    val r = spark.sql(
      """SELECT st_x(st_point(3.5D, -2.0D)) AS x,
        |  st_y(st_point(3.5D, -2.0D)) AS y,
        |  st_distance(st_point(0.0D, 0.0D), st_point(3.0D, 4.0D)) AS d,
        |  st_contains('POLYGON ((0 0, 10 0, 10 6, 0 6, 0 0))',
        |              st_point(5.0D, 3.0D)) AS inside,
        |  st_contains('POLYGON ((0 0, 10 0, 10 6, 0 6, 0 0))',
        |              st_point(5.0D, 7.0D)) AS outside,
        |  st_area('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))') AS sq,
        |  st_area('POLYGON ((0 0, 4 0, 0 3, 0 0))') AS tri
        |""".stripMargin)
      .as[(Double, Double, Double, Boolean, Boolean, Double, Double)].head()
    r shouldBe ((3.5, -2.0, 5.0, true, false, 16.0, 6.0))
  }

  test("geo tier 2: bbox, length, centroid, npoints, envelope, type") {
    import spark.implicits._
    val r = spark.sql(
      """SELECT st_xmin('LINESTRING (1 2, 5 9)') AS xmin,
        |  st_xmax('LINESTRING (1 2, 5 9)') AS xmax,
        |  st_ymin('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))') AS ymin,
        |  st_ymax('POINT (3 7)') AS ymax,
        |  st_length('LINESTRING (0 0, 3 4, 3 10)') AS len,
        |  st_npoints('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))') AS np_poly,
        |  st_npoints('LINESTRING (0 0, 3 4, 3 10)') AS np_ls,
        |  st_x(st_centroid('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))')) AS pcx,
        |  st_y(st_centroid('LINESTRING (0 0, 10 0)')) AS lcy,
        |  st_x(st_centroid('POINT (8 9)')) AS ptx,
        |  st_area(st_envelope('LINESTRING (1 2, 5 9)')) AS env_area,
        |  st_isclosed('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))') AS closed,
        |  st_isclosed('LINESTRING (0 0, 3 4)') AS open,
        |  st_geometry_type('POINT (1 1)') AS t1,
        |  st_geometry_type('LINESTRING (0 0, 1 1)') AS t2,
        |  st_geometry_type('POLYGON ((0 0, 1 0, 1 1, 0 0))') AS t3
        |""".stripMargin)
      .as[(Double, Double, Double, Double, Double, Long, Long, Double,
           Double, Double, Double, Boolean, Boolean, String, String, String)].head()
    r shouldBe ((1.0, 5.0, 0.0, 7.0, 11.0, 4L, 3L, 2.0, 0.0, 8.0, 28.0,
      true, false, "ST_Point", "ST_LineString", "ST_Polygon"))
  }

  test("geo tier 2: st_intersects covers crossing, containment, disjoint") {
    import spark.implicits._
    val r = spark.sql(
      """SELECT
        |  st_intersects('POLYGON ((0 4, 10 4, 10 6, 0 6, 0 4))',
        |                'POLYGON ((4 0, 6 0, 6 10, 4 10, 4 0))') AS crossing,
        |  st_intersects('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))',
        |                'POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))') AS contained,
        |  st_intersects('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))',
        |                'POLYGON ((5 5, 7 5, 7 7, 5 7, 5 5))') AS apart,
        |  st_intersects('POINT (5 5)',
        |                'POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))') AS pt_in,
        |  st_intersects('POINT (3 3)', 'POINT (3 3)') AS pt_eq,
        |  st_disjoint('POINT (9 9)',
        |              'POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))') AS pt_out
        |""".stripMargin)
      .as[(Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)].head()
    r shouldBe ((true, true, false, true, true, true))
  }

  test("word_stem and spooky_hash_v2 resolve through SQL with codegen") {
    import spark.implicits._
    val r = spark.sql(
      """SELECT word_stem('authorized') AS a,
        |  word_stem('intensifying', 'en') AS b,
        |  hex(spooky_hash_v2_32(CAST('hello' AS BINARY))) AS h32,
        |  hex(spooky_hash_v2_64(CAST('' AS BINARY))) AS h64
        |""".stripMargin)
      .as[(String, String, String, String)].head()
    r shouldBe (("author", "intensifi", "D382E6CA", "232706FC6BF50919"))
  }

  test("word_stem dispatches implemented Snowball codes and rejects unknown ones") {
    import spark.implicits._
    // the reference's own non-English vectors (TestWordStemFunction.java:39-43)
    val r = spark.sql(
      """SELECT word_stem('pronunziare', 'it') AS it,
        |  word_stem('continuerait', 'fr') AS fr,
        |  word_stem('torpedearon', 'es') AS es,
        |  word_stem('quilomtricos', 'pt') AS pt,
        |  word_stem('auferstnde', 'de') AS de
        |""".stripMargin)
      .as[(String, String, String, String, String)].head()
    r shouldBe (("pronunz", "continu", "torped", "quilomtr", "auferstnd"))
    val e = intercept[Exception](spark.sql("SELECT word_stem('x', 'xx')"))
    e.getMessage should include("unsupported language")
  }

  test("word_stem dispatches a NON-LITERAL lang column per row") {
    import spark.implicits._
    val r = spark.sql(
      """SELECT word_stem(w, l) AS s FROM VALUES
        |  ('running', 'en'), ('vraiment', 'fr'), ('laufen', 'de')
        |  AS t(w, l) ORDER BY l""".stripMargin)
      .as[String].collect().toSeq
    r shouldBe Seq("lauf", "run", "vrai")
  }

  test("normalize composes NFC and date_parse uses MySQL patterns") {
    import spark.implicits._
    val r = spark.sql(
      """SELECT normalize('Amélie') AS n,
        |  length(normalize('Amélie')) AS ln,
        |  presto_date_format(TIMESTAMP '2001-08-22 03:04:05', '%Y/%m/%d %H:%i:%s') AS f,
        |  cast(date_parse('2001-08-22 03:04:05', '%Y-%m-%d %H:%i:%s') AS STRING) AS p
        |""".stripMargin)
      .as[(String, Int, String, String)].head()
    r._1 shouldBe "Amélie"
    r._2 shouldBe 6
    r._3 shouldBe "2001/08/22 03:04:05"
    r._4 shouldBe "2001-08-22 03:04:05"
  }
}
